"""Corpus-curation operators: decontamination, PII redaction, chunking.

Three more pieces of the training-data north star (the reference has no
curation surface; these follow the published recipes used by large LM
data pipelines):

* **decontaminate** — flag corpus documents sharing any k-gram with an
  evaluation/benchmark set (the GPT-3 appendix-C / Llama recipe:
  13-gram collision ⇒ contaminated; k is a parameter here).
* **pii_scrub** — regex redaction of emails / IPv4s / phone numbers
  with per-document match counts (pure Column expressions, all
  JVM-side; the regexes are RE2-compatible so the DuckDB oracle runs
  the identical patterns).
* **chunk_overlap** — sliding-window token chunking (window W, stride
  S < W ⇒ adjacent chunks overlap by W−S tokens), the retrieval-index
  / context-packing shape.  Map-only: sequence + slice per row, no
  shuffle at any scale.
* **remove_boilerplate** — drop high-document-frequency text segments
  (headers, footers, nav chrome) from every document, the CCNet /
  C4-style within-corpus boilerplate pass: any fixed-width word
  segment appearing in ≥ ``min_df`` documents is removed everywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from readwise_vector_db_spark.functions.text import word_shingles, ws_tokens
from readwise_vector_db_spark.operators.dedup import hash64

# boilerplate sets up to this size stay an array literal (codegen path);
# larger sets broadcast + Arrow-filter (the py4j literal pathology starts
# to bite around 10³ elements)
_LIT_SET_MAX = 512


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_hash: str = "xxhash64",
) -> DataFrame:
    """(doc_id, n_shared) for every corpus doc sharing ≥1 k-gram with
    the eval set; docs absent from the output are clean.

    Shape for 100 TB: the corpus side explodes to hashed k-gram longs
    (one narrow map stage); the eval side — benchmarks are tiny relative
    to any training corpus — collapses to a DISTINCT hashed-shingle set
    that is explicitly ``broadcast``, so the collision join is map-side
    with NO shuffle of the corpus.  The only shuffle is the final
    per-doc count, keyed on doc id.  ``countDistinct`` (not count)
    makes the result insensitive to 64-bit hash collisions merging two
    distinct shingles within one doc.
    """
    c_sh = corpus.select(
        F.col(id_col), F.explode(word_shingles(text_col, k)).alias("shingle")
    ).withColumn("shingle", hash64("shingle", shingle_hash))
    e_sh = (
        eval_set.select(F.explode(word_shingles(text_col, k)).alias("shingle"))
        .withColumn("shingle", hash64("shingle", shingle_hash))
        .distinct()
    )
    return (
        c_sh.join(F.broadcast(e_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("shingle").alias("n_shared"))
    )


# RE2-compatible (no backrefs / lookaround), so Spark (Java regex) and
# DuckDB (RE2) match identical spans.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d[\d ]{7,}\d"


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_email, n_ip, n_phone, clean_md5): match counts per PII
    class and the md5 of the text after replacing every match with a
    typed placeholder (email → ip → phone, in that fixed order — the
    order is part of the contract since an earlier replacement can
    destroy a later pattern's match).

    Entirely built-in Column expressions — regexp_count /
    regexp_replace run inside whole-stage codegen, no Python in the
    path, map-only at any scale.
    """
    c = F.col(text_col)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        F.col(id_col),
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(c, F.lit(IPV4_RE)).alias("n_ip"),
        F.regexp_count(c, F.lit(PHONE_RE)).alias("n_phone"),
        F.md5(clean).alias("clean_md5"),
    )


def chunk_overlap(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "ws",
) -> DataFrame:
    """Sliding-window chunks: (doc_id, chunk_idx, n_chunk_tokens,
    chunk_md5), one row per window of ``window`` tokens starting every
    ``stride`` tokens (last chunk may be short; a doc shorter than one
    window yields a single chunk).

    ``tokenizer="ws"`` (default) budgets in whitespace tokens — map-only
    sequence/slice/explode inside one codegen projection; the chunk text
    is emitted as an md5 so the output stays narrow.  ``tokenizer="bpe"``
    budgets in BPE tokens (functions/bpe.py — real cl100k budgets when
    ``$RWVDB_BPE_RANKS`` points at the artifact, matching the
    reference's tiktoken cap semantics, core/embedding.py:9-14):
    Arrow-batched pandas UDF by necessity, same window/stride/short-doc
    semantics, chunk text = the decoded BPE window (byte-exact
    re-concatenation), still map-only — the tokenizer changes the
    budget, never the shuffle story.
    """
    if not 0 < stride <= window:
        raise ValueError("need 0 < stride <= window")
    if tokenizer == "bpe":
        return _chunk_overlap_bpe(docs, window, stride, id_col, text_col)
    if tokenizer != "ws":
        raise ValueError(f"tokenizer must be ws|bpe, got {tokenizer!r}")
    toks = ws_tokens(text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("n_toks") - 1, F.lit(0)), F.lit(stride)
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, window)
    return (
        docs.select(F.col(id_col), toks.alias("toks"), F.size(toks).alias("n_toks"))
        .filter(F.col("n_toks") > 0)
        .select(F.col(id_col), "toks", F.explode(starts.cast("array<int>")).alias("start"))
        .select(
            F.col(id_col),
            (F.col("start") / stride).cast("int").alias("chunk_idx"),
            F.size(chunk).alias("n_chunk_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
        )
    )


def _segment_array(text_col: str | F.Column, seg_words: int) -> F.Column:
    """array<string> of fixed-width word segments of ``text_col`` —
    consecutive ``seg_words``-word windows, last one possibly short.
    Pure codegen: split + sequence + slice + array_join per row."""
    toks = F.split(F.col(text_col) if isinstance(text_col, str) else text_col, " ")
    n_segs = F.ceil(F.size(toks) / F.lit(seg_words)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_segs - F.lit(1)),
        lambda i: F.array_join(F.slice(toks, i * seg_words + 1, seg_words), " "),
    )


def remove_boilerplate(
    docs: DataFrame,
    seg_words: int = 8,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "auto",
    max_broadcast_segments: int = 20_000,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """(doc_id, clean_text, kept_segs, dropped_segs[, keep_cols...]):
    every document with its boilerplate segments removed.  A *segment* is a
    consecutive ``seg_words``-word window (a proxy for a line — the
    fixture corpus has no newlines; real corpora would segment on
    ``\\n`` with the same plumbing); a segment is *boilerplate* when it
    occurs in ≥ ``min_df`` distinct documents.  This is the CCNet
    paragraph-dedup / C4 "lines seen elsewhere" pass that strips
    headers, footers, cookie banners and nav chrome from crawled text.

    Shape for 100 TB — the key fact is that the boilerplate set is
    SMALL by construction: segments with df ≥ min_df number at most
    (total segment instances) / min_df, i.e. ≤ avg_segs_per_doc ·
    n_docs / min_df, and with min_df a fraction of the corpus (the
    usual CCNet setting) the bound is avg_segs_per_doc / frac —
    INDEPENDENT of corpus size.  So:

    * one shuffle computes document frequency over 8-byte ``xxhash64``
      segment keys (strings never shuffle; partial aggregation runs
      map-side);
    * ``strategy="map"`` (picked by ``auto`` whenever the boilerplate
      set fits ``max_broadcast_segments``): collect the offending
      hashes (driver-bounded by the argument above) and rebuild every
      document MAP-ONLY — original segment order is preserved for free,
      and the corpus text crosses no shuffle at all.  Small sets
      (≤ ``_LIT_SET_MAX``) embed as an array literal tested with
      ``array_contains`` — pure whole-stage codegen, no Python stage.
      Larger sets must NOT: ``F.lit(list)`` pays a py4j round-trip per
      element at plan build (~1.4 s at 3 k elements, the pathology this
      repo documents in operators/search.py) and ``array_contains``
      linear-scans the array per segment (O(segments·set) compute).
      They broadcast as a Python frozenset instead and one Arrow
      ``pandas_udf`` filters each document's segments with O(1) hash
      lookups — hashes still computed JVM-side by ``xxhash64``;
    * ``strategy="shuffle"`` (the fallback for degenerate corpora
      where "boilerplate" is most of the text): posexplode → left-anti
      broadcast join against the df table → re-assemble per doc with a
      sorted ``collect_list``.  One extra doc-keyed shuffle of the
      kept text — still linear, never all-pairs.

    64-bit hash collisions could merge a rare segment into a
    boilerplate one (dropping it wrongly); at 10^9 distinct segments
    the expected number of colliding pairs is ~0.03 — and the df pass
    can be re-keyed on the segment string if a corpus ever needs the
    exactness more than the shuffle-width win.

    No reference counterpart (the reference ingests curated highlights
    and never filters text) — north-star scope, SURVEY §2.7.
    """
    if seg_words < 1:
        raise ValueError("seg_words must be >= 1")
    if min_df < 2:
        raise ValueError("min_df must be >= 2 (df=1 segments are just text)")
    if strategy not in ("auto", "map", "shuffle"):
        raise ValueError(f"strategy must be auto|map|shuffle, got {strategy!r}")

    # keep_cols ride the map path for free and the shuffle path's
    # totals frame (already per-doc) — a caller composing a pipeline
    # never needs a join to reattach its metadata columns
    extra = list(keep_cols or [])
    segs_arr = _segment_array(text_col, seg_words)
    base = docs.select(F.col(id_col), F.col(text_col), *extra).withColumn(
        "_segs", segs_arr
    )
    seg_df = (
        base.select(F.col(id_col), F.explode("_segs").alias("_seg"))
        .select(F.col(id_col), F.xxhash64("_seg").alias("h"))
        .groupBy("h")
        .agg(F.count_distinct(id_col).alias("df"))
        .filter(F.col("df") >= F.lit(min_df))
        .select("h")
    )

    if strategy in ("auto", "map"):
        # driver-bounded by the df ≥ min_df counting bound (docstring);
        # cap guards the degenerate case before collecting too much
        common = [
            r["h"] for r in seg_df.limit(max_broadcast_segments + 1).collect()
        ]
        if len(common) <= max_broadcast_segments:
            if not common:
                out = base.withColumn("_kept", F.col("_segs"))
            elif len(common) <= _LIT_SET_MAX:
                # small set: literal + array_contains stays inside
                # whole-stage codegen — no Python stage at all
                lit_common = F.lit(sorted(common))
                out = base.withColumn(
                    "_kept",
                    F.filter(
                        F.col("_segs"),
                        lambda s: ~F.array_contains(lit_common, F.xxhash64(s)),
                    ),
                )
            else:
                # big set: broadcast a frozenset, filter per document in
                # ONE Arrow pass with O(1) membership — never an F.lit
                # literal (py4j per-element round-trip at plan build) or
                # a per-segment linear array scan
                from pyspark.sql.pandas.functions import pandas_udf

                bset = docs.sparkSession.sparkContext.broadcast(
                    frozenset(int(h) for h in common)
                )

                @pandas_udf(T.ArrayType(T.StringType()))
                def _keep(segs: pd.Series, hs: pd.Series) -> pd.Series:
                    s = bset.value
                    return pd.Series(
                        [
                            [seg for seg, h in zip(a, b) if int(h) not in s]
                            for a, b in zip(segs, hs)
                        ]
                    )

                out = base.withColumn(
                    "_kept",
                    _keep(
                        F.col("_segs"),
                        F.transform("_segs", lambda s: F.xxhash64(s)),
                    ),
                )
            return out.select(
                F.col(id_col),
                F.array_join("_kept", " ").alias("clean_text"),
                F.size("_kept").cast("long").alias("kept_segs"),
                (F.size("_segs") - F.size("_kept")).cast("long").alias(
                    "dropped_segs"
                ),
                *extra,
            )
        if strategy == "map":
            raise ValueError(
                f"boilerplate set exceeds max_broadcast_segments="
                f"{max_broadcast_segments}; use strategy='shuffle'"
            )

    exploded = base.select(
        F.col(id_col),
        F.size("_segs").cast("long").alias("_total"),
        F.posexplode("_segs").alias("_seg_id", "_seg"),
    ).withColumn("h", F.xxhash64("_seg"))
    kept = exploded.join(F.broadcast(seg_df), "h", "left_anti")
    agg = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_seg_id", "_seg"))),
                lambda s: s["_seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("kept_segs"),
    )
    totals = base.select(
        F.col(id_col), F.size("_segs").cast("long").alias("_total"), *extra
    )
    return (
        totals.join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("kept_segs", F.lit(0)).cast("long").alias("kept_segs"),
            (F.col("_total") - F.coalesce("kept_segs", F.lit(0)))
            .cast("long")
            .alias("dropped_segs"),
            *extra,
        )
    )


def _chunk_overlap_bpe(
    docs: DataFrame, window: int, stride: int, id_col: str, text_col: str
) -> DataFrame:
    """BPE-budget chunking: one Arrow batch in, an exploded chunk list
    out.  Encode once per doc, slice the id stream (ids, not re-encoded
    text, so every chunk is exactly ``window`` tokens by construction),
    md5 the decoded window.  Parallelism is per-row — no cross-row
    state, so this scales exactly like the ws path."""
    import hashlib as _hl

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<chunk_idx:int,n_chunk_tokens:int,chunk_md5:string>>")
    def _chunks(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from readwise_vector_db_spark.functions import bpe

        ranks = bpe.default_ranks()  # resolved once per executor

        def per_doc(text):
            if text is None:
                return None
            ids = bpe.encode(text, ranks)
            n = len(ids)
            if n == 0:
                return None
            out = []
            for start in range(0, max(n - 1, 0) + 1, stride):
                piece = ids[start : start + window]
                out.append(
                    (
                        start // stride,
                        len(piece),
                        _hl.md5(bpe.decode(piece, ranks).encode()).hexdigest(),
                    )
                )
            return out

        for s in it:
            yield s.map(per_doc)

    return (
        docs.select(F.col(id_col), _chunks(F.col(text_col)).alias("_ch"))
        .filter(F.col("_ch").isNotNull())
        .select(F.col(id_col), F.explode("_ch").alias("c"))
        .select(
            F.col(id_col),
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
            F.col("c.chunk_md5").alias("chunk_md5"),
        )
    )
