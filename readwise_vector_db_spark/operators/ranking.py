"""Lexical ranked retrieval (BM25) and hybrid rank fusion (RRF).

The reference serves vector-only search (`core/search.py`); real
retrieval stacks pair that with a lexical ranker and fuse the two rank
lists — the standard hybrid-search shape (Robertson & Zaragoza 2009 for
BM25; Cormack, Clarke & Buettcher SIGIR'09 for reciprocal-rank fusion).
Both are pure DataFrame compositions, fully SQL-expressible, so the
oracle hash-checks them end-to-end.

Scale shape of :func:`bm25_topk` — deliberately NOT the textbook
explode→join→groupBy pipeline:

- **No per-token shuffle.**  The query has Q terms (a handful); per-doc
  term frequencies are Q array-filter counts over the tokenized text —
  one map-only pass.  An exploded inverted-index build shuffles every
  token in the corpus to answer a Q-term query.
- **Corpus stats ride one 1-row aggregate** (N, avgdl, and Q document
  frequencies as conditional sums) broadcast-joined back — the tfidf
  suite's no-driver-action pattern.
- **Top-k is TakeOrderedAndProject** on the rounded score.

Cross-engine determinism: per-term contributions are rounded at 9 dp
(ln ulp guard, the tfidf precedent), summed in fixed query order, the
total rounded at 6 dp, and ranking ties break on doc id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from readwise_vector_db_spark.functions.text import ws_tokens


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bm25) for every document with a positive score.

    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the Lucene/Robertson
    non-negative variant), ``tf_norm = tf·(k1+1) / (tf + k1·(1 - b +
    b·dl/avgdl))``.  Terms are matched on the whitespace tokenization the
    rest of the text suite uses (functions/text.ws_tokens).
    """
    terms = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("bm25 needs at least one query term")

    def tf_of(term: str) -> Column:
        # single-param lambda: a 2-arg lambda would flip F.filter into
        # its (element, index) form and compare tokens to positions
        return F.size(F.filter(F.col("_toks"), lambda x: x == F.lit(term)))

    base = (
        docs.select(
            F.col(id_col), ws_tokens(F.lower(F.col(text_col))).alias("_toks")
        )
        .withColumn("_dl", F.size("_toks"))
        .select(
            id_col,
            "_dl",
            *[tf_of(t).alias(f"_tf{i}") for i, t in enumerate(terms)],
        )
    )
    stats = base.agg(
        F.count("*").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("int")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )

    def contrib(i: int) -> Column:
        tf = F.col(f"_tf{i}").cast("double")
        df = F.col(f"_df{i}").cast("double")
        idf = F.log(
            F.lit(1.0) + (F.col("_n") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        norm = (tf * F.lit(k1 + 1.0)) / (
            tf
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("_dl").cast("double") / F.col("_avgdl")
            )
        )
        return F.round(idf * norm, 9)

    total = contrib(0)
    for i in range(1, len(terms)):
        total = total + contrib(i)
    return (
        base.crossJoin(F.broadcast(stats))
        .select(F.col(id_col), F.round(total, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25, ties broken by id: (id, bm25, rank)."""
    from pyspark.sql import Window as W

    scored = bm25_scores(docs, query_terms, k1=k1, b=b, id_col=id_col, text_col=text_col)
    w = W.orderBy(F.desc("bm25"), F.asc(id_col))
    return (
        scored.orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k_rrf: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of rank lists: (id, rrf_score, n_lists).

    ``rrf = Σ_lists 1/(k_rrf + rank)``.  Each input carries (id, rank)
    for its own top-N — serving-bounded frames, so the union and the
    group-by are trivially small no matter the corpus size; fusion cost
    never depends on N_docs.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(rank_col).cast("double"))).alias(
                "_w"
            ),
        )
        for r in rankings
    ]
    allw = parts[0]
    for p in parts[1:]:
        allw = allw.unionByName(p)
    return (
        allw.groupBy(id_col)
        .agg(
            F.round(F.sum("_w"), 9).alias("rrf_score"),
            F.count("*").cast("int").alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )
