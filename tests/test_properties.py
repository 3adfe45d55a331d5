"""Property-based checks (hypothesis) against brute-force references.

Each property runs a handful of small random cases — Spark job latency
makes per-example cost ~0.5 s, so examples are few but adversarial
(hypothesis shrinks failures to minimal cases).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (uid, ts) pairs with small domains so collisions/ties actually happen
_EVENTS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=15
)

# adversarial SQL-literal content: quotes, backslashes, unicode, control chars
_NASTY = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\x00"
    ),
    min_size=0,
    max_size=12,
)


@given(
    source_type=st.one_of(st.none(), _NASTY),
    lang=st.one_of(st.none(), _NASTY),
    tags=st.one_of(st.none(), st.lists(_NASTY, min_size=1, max_size=3)),
)
@settings(**SETTINGS)
def test_meta_filter_sql_matches_dataframe_filters(spark, source_type, lang, tags):
    """The serving path renders F2-F7 as SQL text (operators/search.py:
    meta_filter_sql); for ANY filter values — including quotes,
    backslashes, and unicode — the rendered WHERE must select exactly
    the rows the DataFrame twin (apply_meta_filters) selects.  This is
    the injection-safety property of sql_quote: hostile content can only
    ever be a literal, never syntax."""
    from readwise_vector_db_spark.operators.search import (
        SearchParams,
        apply_meta_filters,
        meta_filter_sql,
    )

    rows = [
        ("a", "note", "en", ["x", "y"]),
        ("b", source_type or "t'\\b", lang or "d\"e", tags or ["'", "\\"]),
        ("c", "note", "fr", []),
        ("d", None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "id string, source_type string, lang string, tags array<string>"
    )
    params = SearchParams(source_type=source_type, lang=lang, tags=tags)
    want = sorted(r["id"] for r in apply_meta_filters(df, params).collect())
    frag = meta_filter_sql(params, df.columns)
    if frag is None:
        got = sorted(r["id"] for r in df.collect())
    else:
        df.createOrReplaceTempView("meta_prop_t")
        got = sorted(
            r["id"]
            for r in spark.sql(f"SELECT id FROM meta_prop_t WHERE {frag}").collect()
        )
    assert got == want


@given(left=_EVENTS, right=_EVENTS)
@settings(**SETTINGS)
def test_asof_join_matches_bruteforce(spark, left, right):
    from readwise_vector_db_spark.operators.asof import asof_join

    # dedupe right per (uid, ts): asof_join requires unique right keys
    rmap = {}
    for i, (u, t) in enumerate(right):
        rmap[(u, t)] = i
    rrows = [(u, t, v) for (u, t), v in rmap.items()]
    lrows = [(u, t, i) for i, (u, t) in enumerate(left)]
    ldf = spark.createDataFrame(lrows, "uid INT, ts INT, lid INT")
    rdf = spark.createDataFrame(rrows, "uid INT, ts INT, val INT")
    got = {
        r["lid"]: r["val"]
        for r in asof_join(ldf, rdf, key="uid", payload=["val"]).collect()
    }
    for u, t, lid in lrows:
        candidates = [(rt, v) for (ru, rt), v in rmap.items() if ru == u and rt <= t]
        expect = max(candidates)[1] if candidates else None
        assert got[lid] == expect, (u, t, candidates)


@given(
    base=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 99)), max_size=12),
    updates=st.lists(st.tuples(st.integers(0, 9), st.integers(100, 199)), max_size=12),
)
@settings(**SETTINGS)
def test_merge_upsert_last_writer_wins(spark, base, updates):
    from readwise_vector_db_spark.operators.upsert import dedup_updates, merge_upsert

    bmap = dict(base)  # python dict: later entries win, like dedup_updates max
    brows = [(k, v) for k, v in bmap.items()]
    if not brows:
        brows = [(999, 0)]
        bmap = {999: 0}
    bdf = spark.createDataFrame(brows, "id INT, v INT")
    udf_rows = [(k, v) for k, v in updates]
    if udf_rows:
        udf = dedup_updates(
            spark.createDataFrame(udf_rows, "id INT, v INT"), "id", "v"
        )
        merged = {r["id"]: r["v"] for r in merge_upsert(bdf, udf, "id").collect()}
        umap = {}
        for k, v in udf_rows:
            umap[k] = max(umap.get(k, -1), v)
        expect = {**bmap, **umap}
    else:
        merged = {r["id"]: r["v"] for r in bdf.collect()}
        expect = bmap
    assert merged == expect


_WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]),
    min_size=3,
    max_size=12,
)


@given(texts=st.lists(_WORDS, min_size=2, max_size=6))
@settings(**SETTINGS)
def test_ngram_jaccard_matches_bruteforce(spark, texts):
    from readwise_vector_db_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(texts)], "doc_id INT, text STRING"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.3, k=2).collect()
    }

    def shingles(ws):
        return {" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)}

    expect = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = shingles(texts[a]), shingles(texts[b])
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if round(j, 6) >= 0.3:
                expect[(a, b)] = round(j, 6)
    assert got == expect


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=20
    )
)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    from readwise_vector_db_spark.operators.graph import connected_components

    rows = [(a, b) for a, b in edges if a != b]
    if not rows:
        rows = [(0, 1)]
    df = spark.createDataFrame(rows, "src INT, dst INT")
    got = {
        r["id"]: r["component"] for r in connected_components(df).collect()
    }

    # brute-force union-find with min-label components
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in rows:
        union(a, b)
    expect = {v: find(v) for v in parent}
    assert got == expect


@given(
    texts=st.lists(
        st.sampled_from(["aa bb cc dd", "aa bb cc dd ee", "zz yy xx ww"]),
        min_size=2,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_exact_dedup_min_id_survives_and_is_idempotent(spark, texts):
    from readwise_vector_db_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )
    once = exact_dedup(docs)
    got = sorted((r["doc_id"], r["text"]) for r in once.collect())
    # brute force: min id per exact text
    first: dict[str, int] = {}
    for i, t in enumerate(texts):
        first.setdefault(t, i)
    expect = sorted((i, t) for t, i in first.items())
    assert got == expect
    # idempotent: deduping the deduped set is a no-op
    again = sorted((r["doc_id"], r["text"]) for r in exact_dedup(once).collect())
    assert again == got


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow  # randomized property loop (r13: excluded from the default run)
def test_minhash_and_simhash_always_pair_identical_docs(spark, seed):
    """Guarantee property: byte-identical documents MUST collide in every
    LSH band (minhash est = 1.0) and in every simhash chunk — a detector
    that can miss exact duplicates is broken regardless of tuning."""
    import random

    from readwise_vector_db_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
    )

    rng = random.Random(seed)
    vocab = ["w%d" % i for i in range(30)]
    text = " ".join(rng.choice(vocab) for _ in range(25))
    other = " ".join(rng.choice(vocab) for _ in range(25))
    docs = spark.createDataFrame(
        [(0, text), (1, text), (2, other)], "doc_id INT, text STRING"
    )
    mh = {(r["id_a"], r["id_b"]): r["est_jaccard"]
          for r in minhash_lsh_pairs(docs, threshold=0.9).collect()}
    assert mh.get((0, 1)) == 1.0
    sh = {(r["id_a"], r["id_b"]): r["hamming"]
          for r in simhash_pairs(docs, max_hamming=0).collect()}
    assert sh.get((0, 1)) == 0


# small shared-vocab corpora so df/tf collisions and OOV actually happen
_VOCAB = ["a", "bb", "cat", "dog", "run"]
_DOCS = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=10),
    min_size=1,
    max_size=6,
)


@given(docs=_DOCS, terms=st.lists(st.sampled_from(_VOCAB + ["zzz"]), min_size=1, max_size=3, unique=True))
@settings(**SETTINGS)
def test_bm25_matches_brute_force(spark, docs, terms):
    """bm25_scores == the literal formula on ANY corpus, including empty
    documents (whose regex tokenization yields one empty token — part of
    dl and avgdl, exactly as the SQL twin sees it) and all-OOV queries."""
    import math
    import re

    from readwise_vector_db_spark.operators import ranking

    rows = [(i, " ".join(w)) for i, w in enumerate(docs)]
    got = {
        r["doc_id"]: r["bm25"]
        for r in ranking.bm25_scores(
            spark.createDataFrame(rows, "doc_id long, text string"), terms
        ).collect()
    }

    toks = {i: re.split(r"\s+", t.lower()) for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    want = {}
    for i, _ in rows:
        s = 0.0
        for term in terms:
            tf = toks[i].count(term)
            df = sum(1 for v in toks.values() if term in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += round(
                idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(toks[i]) / avgdl)),
                9,
            )
        if round(s, 6) > 0:
            want[i] = round(s, 6)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1.1e-6)


@given(ref=_DOCS, targets=_DOCS)
@settings(**SETTINGS)
def test_lm_matches_brute_force(spark, ref, targets):
    """lm_score_docs == the literal smoothed-bigram formula for ANY
    reference/target split, including OOV-only targets and single-token
    documents (NULL scores)."""
    import math
    import re

    from readwise_vector_db_spark.operators import lm

    ref_rows = [(i, " ".join(w)) for i, w in enumerate(ref)]
    tgt_rows = [(i, " ".join(w)) for i, w in enumerate(targets)]
    uni, bi, v = lm.train_bigram_lm(
        spark.createDataFrame(ref_rows, "doc_id long, text string")
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
        for r in lm.lm_score_docs(
            spark.createDataFrame(tgt_rows, "doc_id long, text string"), uni, bi, v
        ).collect()
    }
    for i, t in tgt_rows:
        w = re.split(r"\s+", t.lower())
        nb = len(w) - 1
        if nb < 1:
            assert got[i] == (0, None)
            continue
        total = sum(
            round(
                math.log(
                    (bi.get((w[j], w[j + 1]), 0) + 0.5) / (uni.get(w[j], 0) + 0.5 * v)
                )
                * 1e9
            )
            for j in range(nb)
        )
        assert got[i][0] == nb
        assert got[i][1] == pytest.approx((total / 1e9) / nb, abs=1.1e-6)


@given(
    lens=st.lists(st.integers(1, 40), min_size=1, max_size=60),
    capacity=st.integers(5, 30),
)
@settings(**SETTINGS)
def test_pack_greedy_invariants(spark, lens, capacity):
    """For ANY length distribution: every doc packed exactly once,
    non-overflow bins within capacity, overflow iff length > capacity,
    and best-fit wastes no bin that another doc could still have
    joined at its creation time (bins are only opened when nothing
    open fits)."""
    from readwise_vector_db_spark.operators.sampling import pack_greedy

    rows = [(i, n) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_greedy(df, capacity=capacity, n_shards=2).collect()
    assert len(out) == len(lens)
    fills: dict[tuple, int] = {}
    for r in out:
        assert r["overflow"] == (r["n_tokens"] > capacity)
        if not r["overflow"]:
            key = (r["shard"], r["bin"])
            fills[key] = fills.get(key, 0) + r["n_tokens"]
    assert all(f <= capacity for f in fills.values())


# tiny token alphabet + short docs → repeated windows occur constantly,
# including overlapping and within-doc repeats (the adversarial shapes)
_SPAN_DOCS = st.lists(
    st.lists(st.sampled_from("abc"), min_size=0, max_size=12),
    min_size=1,
    max_size=6,
)


@given(docs=_SPAN_DOCS)
@settings(**SETTINGS)
def test_span_cut_matches_bruteforce(spark, docs):
    """The round-9 skew-immune cut (min(struct) + composite anti-join)
    must implement EXACTLY Lee et al.'s rule: every occurrence of a
    window repeated >= 2 times corpus-wide is cut except the globally
    first by (id, pos), masking per token index.  Brute-force reference
    computed in plain Python over a 3-letter alphabet with n=3, where
    overlapping repeats, within-doc repeats, and whole-doc windows all
    occur."""
    from readwise_vector_db_spark.operators.dedup import drop_repeated_spans

    n = 3
    toks = {i: list(d) for i, d in enumerate(docs)}
    # brute-force spec
    occ: dict[tuple, list] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - n + 1):
            occ.setdefault(tuple(ts[p : p + n]), []).append((i, p))
    cov: dict[int, set] = {i: set() for i in toks}
    for sites in occ.values():
        if len(sites) < 2:
            continue
        for (i, p) in sorted(sites)[1:]:  # all but globally-first
            cov[i].update(range(p, p + n))
    want = {
        i: (
            " ".join(t for j, t in enumerate(ts) if j not in cov[i]),
            len(cov[i]),
        )
        for i, ts in toks.items()
    }

    df = spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in toks.items()],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_removed"])
        for r in drop_repeated_spans(df, n=n).collect()
    }
    # ws_tokens of "" yields one empty token; the operator emits every
    # non-null-text doc, token-rejoined — mirror that for empty docs
    assert got == want


@given(docs=_SPAN_DOCS)
@settings(**SETTINGS)
def test_doc_dup_fraction_matches_bruteforce(spark, docs):
    """The scoring twin counts EVERY occurrence of a repeated window
    (including the kept first) toward coverage — brute-forced over the
    same adversarial 3-letter corpus."""
    from readwise_vector_db_spark.operators.dedup import doc_dup_fraction

    n = 3
    toks = {i: list(d) for i, d in enumerate(docs)}
    occ: dict[tuple, list] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - n + 1):
            occ.setdefault(tuple(ts[p : p + n]), []).append((i, p))
    cov: dict[int, set] = {i: set() for i in toks}
    for sites in occ.values():
        if len(sites) < 2:
            continue
        for (i, p) in sites:  # ALL occurrences count toward the score
            cov[i].update(range(p, p + n))
    df = spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in toks.items()],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_fraction"])
        for r in doc_dup_fraction(df, n=n).collect()
    }
    for i, ts in toks.items():
        # ws_tokens("") is a single empty token, so trust the engine's
        # n_tokens and check coverage + fraction against it
        nt = got[i][0]
        assert got[i][1] == len(cov[i])
        expect_frac = round(len(cov[i]) / nt, 6) if nt > 0 else 0.0
        assert abs(got[i][2] - expect_frac) < 1e-9


@given(docs=_SPAN_DOCS, min_span=st.integers(min_value=3, max_value=7))
@settings(**SETTINGS)
def test_maximal_span_cut_matches_bruteforce(spark, docs, min_span):
    """r10 verdict item 6: min_span_tokens cuts ONLY occurrences inside
    maximal runs of consecutive repeated windows covering ≥ L tokens
    (keep-first ranked among qualifying occurrences) — brute-forced
    over the adversarial 3-letter corpus."""
    from readwise_vector_db_spark.operators.dedup import drop_repeated_spans

    n = 3
    toks = {i: list(d) for i, d in enumerate(docs)}
    occ: dict[tuple, list] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - n + 1):
            occ.setdefault(tuple(ts[p : p + n]), []).append((i, p))
    repeated = {
        (i, p) for sites in occ.values() if len(sites) >= 2 for (i, p) in sites
    }
    # chain consecutive repeated positions per doc into maximal runs;
    # qualifying = runs whose region covers >= min_span tokens
    qual: set[tuple[int, int]] = set()
    for i in toks:
        ps = sorted(p for (j, p) in repeated if j == i)
        run: list[int] = []
        for p in ps + [None]:
            if run and (p is None or p != run[-1] + 1):
                if run[-1] - run[0] + n >= min_span:
                    qual.update((i, q) for q in run)
                run = []
            if p is not None:
                run.append(p)
    cov: dict[int, set] = {i: set() for i in toks}
    for sites in occ.values():
        qsites = sorted(s for s in sites if s in qual)
        if len(sites) < 2:
            continue
        for (i, p) in qsites[1:]:  # all but FIRST QUALIFYING occurrence
            cov[i].update(range(p, p + n))
    want = {
        i: (
            " ".join(t for j, t in enumerate(ts) if j not in cov[i]),
            len(cov[i]),
        )
        for i, ts in toks.items()
    }
    df = spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in toks.items()],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_removed"])
        for r in drop_repeated_spans(df, n=n, min_span_tokens=min_span).collect()
    }
    assert got == want


@given(
    text=st.text(
        alphabet=["a", "b", "z", " ", "\t", "\n", " ", "　",
                  " ", " "],
        max_size=24,
    )
)
@settings(max_examples=150, deadline=None)
def test_python_tokenizer_matches_re2_on_unicode_whitespace(text):
    """r11: the Arrow-side whitespace tokenizer must agree with the
    DuckDB twins' RE2 \\s over any mix of ASCII and Unicode whitespace
    (Python's default \\s splits nbsp/ideographic/thin/line-separator
    spaces; ASCII mode must not).  Joined text round-trips because no
    token can contain ASCII whitespace."""
    import duckdb

    from readwise_vector_db_spark.operators.signals import _ws_tokens_py

    got = _ws_tokens_py(text)
    (want,) = duckdb.sql(
        "SELECT CASE WHEN ? = '' THEN [] "
        "ELSE string_split_regex(?, '\\s+') END",
        params=[text, text],
    ).fetchone()
    assert got == want


@given(
    text=st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",),
            exclude_characters="\x00",
        ),
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_python_nfc_matches_duckdb_nfc_normalize(text):
    """Round 12 (r11 verdict item 5): the engine's Unicode
    normalization (`unicodedata.normalize('NFC', ...)` inside
    `functions.text.unicode_normalize`) must agree byte-for-byte with
    the oracle twin DuckDB's `nfc_normalize` over arbitrary unicode —
    the same cross-engine semantic audit the r11 whitespace pinning
    performed for `\\s` (a silent normalization divergence would make
    the dedup_exact_nfc oracle row lie).  NUL is excluded from the
    domain: DuckDB's utf8proc-backed normalizer truncates at an
    embedded NUL whenever non-ASCII content makes it actually run
    (probed: nfc_normalize('\x00\x80') = ''), while Python passes it
    through — a stated oracle-scope limit, not an engine bug; no real
    text fixture contains NUL."""
    import unicodedata

    import duckdb

    got = unicodedata.normalize("NFC", text)
    (want,) = duckdb.sql(
        "SELECT nfc_normalize(?)", params=[text]
    ).fetchone()
    assert got == want
