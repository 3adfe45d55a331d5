"""Bigram LM quality scoring (operators/lm.py) vs a hand-rolled reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from readwise_vector_db_spark.operators import lm

REF = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "cats and dogs"),
]
TARGETS = REF + [
    (3, "the cat sat"),          # all seen bigrams — low perplexity
    (4, "zebra quantum flux"),    # all unseen — high perplexity
    (5, "single"),                # no bigram evidence -> NULLs
]


def _ref_model(docs):
    uni, bi = {}, {}
    for _, t in docs:
        w = t.lower().split()
        for x in w:
            uni[x] = uni.get(x, 0) + 1
        for a, b in zip(w, w[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    return uni, bi, len(uni)


def _ref_score(text, uni, bi, v, k=0.5):
    w = text.lower().split()
    if len(w) < 2:
        return 0, None, None
    total = 0
    for a, b in zip(w, w[1:]):
        p = (bi.get((a, b), 0) + k) / (uni.get(a, 0) + k * v)
        total += round(math.log(p) * 1e9)
    n = len(w) - 1
    avg = (total / 1e9) / n
    # JVM-side HALF_UP at 6dp
    import decimal

    avg_r = float(
        decimal.Decimal(avg).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )
    return n, avg_r, None


def test_lm_matches_reference(spark):
    ref_df = spark.createDataFrame(REF, "doc_id long, text string")
    tgt_df = spark.createDataFrame(TARGETS, "doc_id long, text string")
    uni, bi, v = lm.train_bigram_lm(ref_df)
    r_uni, r_bi, r_v = _ref_model(REF)
    assert (uni, v) == (r_uni, r_v)
    assert bi == r_bi

    rows = {r["doc_id"]: r for r in lm.lm_score_docs(tgt_df, uni, bi, v).collect()}
    assert len(rows) == len(TARGETS)
    for did, text in TARGETS:
        n, avg, _ = _ref_score(text, uni, bi, v)
        got = rows[did]
        assert got["n_bigrams"] == n
        if n == 0:
            assert got["avg_logp"] is None and got["ppl"] is None
        else:
            assert got["avg_logp"] == pytest.approx(avg, abs=1e-9)
            assert got["ppl"] == pytest.approx(
                round(math.exp(-got["avg_logp"]), 6), abs=1e-6
            )


def test_lm_orders_quality(spark):
    """Seen-bigram text scores lower perplexity than unseen-vocab text."""
    ref_df = spark.createDataFrame(REF, "doc_id long, text string")
    tgt_df = spark.createDataFrame(TARGETS, "doc_id long, text string")
    uni, bi, v = lm.train_bigram_lm(ref_df)
    rows = {r["doc_id"]: r for r in lm.lm_score_docs(tgt_df, uni, bi, v).collect()}
    assert rows[3]["ppl"] < rows[4]["ppl"]
    # in-reference docs score at least as well as the novel-but-seen one
    assert rows[0]["ppl"] < rows[4]["ppl"]


def test_lm_min_count_prunes_singletons(spark):
    """min_count=2 drops every count-1 entry from BOTH tables; survivors
    keep their full counts; V is the KEPT vocab size; and a surviving
    bigram's head word always survives (c(w1) >= c(w1,w2))."""
    ref_df = spark.createDataFrame(REF, "doc_id long, text string")
    r_uni, r_bi, _ = _ref_model(REF)
    uni, bi, v = lm.train_bigram_lm(ref_df, min_count=2)
    assert uni == {w: c for w, c in r_uni.items() if c >= 2}
    assert bi == {k: c for k, c in r_bi.items() if c >= 2}
    assert v == len(uni) and 0 < v < len(r_uni)
    assert all(w1 in uni for (w1, _) in bi)
    # scoring still works end-to-end with the pruned model; pruned
    # words score as unseen via the smoothed count floors
    tgt_df = spark.createDataFrame(TARGETS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in lm.lm_score_docs(tgt_df, uni, bi, v).collect()}
    n3, avg3, _ = _ref_score("the cat sat", uni, bi, v)
    assert rows[3]["n_bigrams"] == n3
    assert rows[3]["avg_logp"] == pytest.approx(avg3, abs=1e-9)
    assert rows[5]["ppl"] is None


def test_lm_max_vocab_caps_model_size(spark):
    """A corpus whose vocabulary exceeds the cap yields exactly
    max_vocab unigrams — top-N by (count desc, word asc) — and bigrams
    restricted to in-vocab words on both positions (≤ cap² keys)."""
    ref_df = spark.createDataFrame(REF, "doc_id long, text string")
    r_uni, r_bi, r_v = _ref_model(REF)
    cap = 4
    assert r_v > cap  # the corpus would otherwise exceed the cap
    uni, bi, v = lm.train_bigram_lm(ref_df, max_vocab=cap)
    assert len(uni) == cap == v
    expect = sorted(r_uni.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
    assert uni == dict(expect)
    assert all(w1 in uni and w2 in uni for (w1, w2) in bi)
    assert bi == {
        k: c for k, c in r_bi.items() if k[0] in uni and k[1] in uni
    }


def test_lm_collect_guard_raises_instead_of_oom(spark):
    """When the prune leaves more rows than max_model_rows, the collect
    raises loudly (bounded at guard+1 rows) instead of materializing
    the table on the driver."""
    ref_df = spark.createDataFrame(REF, "doc_id long, text string")
    with pytest.raises(ValueError, match="max_model_rows"):
        lm.train_bigram_lm(ref_df, max_model_rows=3)
    with pytest.raises(ValueError, match="min_count must be"):
        lm.train_bigram_lm(ref_df, min_count=0)


def test_lm_empty_reference_rejects_loudly(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        lm.train_bigram_lm(empty)
    with pytest.raises(ValueError, match="vocab_size"):
        lm.lm_score_docs(
            spark.createDataFrame([(0, "a b")], "doc_id long, text string"),
            {}, {}, 0,
        )


def test_bigram_lm_save_load_roundtrip(spark, tmp_path):
    """r10: the LM persists as a serving artifact — training is the
    offline job; a loaded model scores bit-identically, and the layout
    stamp refuses wrong-family directories."""
    import pytest as _pytest

    from readwise_vector_db_spark.layout import LayoutVersionError, read_stamp
    from readwise_vector_db_spark.operators import lm

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ran"),
         (3, " leading space edge"), (4, "the mat sat")],
        "doc_id long, text string",
    )
    uni, bi, v = lm.train_bigram_lm(docs, min_count=1)
    path = str(tmp_path / "lm_artifact")
    lm.save_bigram_lm(path, uni, bi, v, add_k=0.5)
    assert read_stamp(path)["family"] == "bigram_lm"
    uni2, bi2, v2, add_k2 = lm.load_bigram_lm(path)
    assert (uni2, bi2, v2, add_k2) == (uni, bi, v, 0.5)
    want = lm.lm_score_docs(docs, uni, bi, v).collect()
    got = lm.lm_score_docs(docs, uni2, bi2, v2).collect()
    assert sorted(map(tuple, want)) == sorted(map(tuple, got))
    # wrong family refuses loudly
    with _pytest.raises(LayoutVersionError, match="family"):
        from readwise_vector_db_spark.operators import pq

        pq.load_pq_index(spark, path)
