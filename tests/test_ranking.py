"""BM25 + RRF fusion (operators/ranking.py) vs a hand-rolled reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from readwise_vector_db_spark.operators import ranking

DOCS = [
    (0, "spark window merge spark spark"),
    (1, "window window window scan"),
    (2, "merge of the day"),
    (3, "nothing relevant here"),
    (4, "spark"),
]


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, t in docs:
        score = 0.0
        for term in terms:
            tf = toks[i].count(term)
            df = sum(1 for v in toks.values() if term in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            norm = (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(toks[i]) / avgdl)
            )
            score += round(idf * norm, 9)
        if round(score, 6) > 0:
            out[i] = round(score, 6)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_reference(spark, docs_df):
    terms = ["spark", "merge"]
    got = {
        r["doc_id"]: r["bm25"]
        for r in ranking.bm25_scores(docs_df, terms).collect()
    }
    assert got == _ref_bm25(DOCS, terms)


def test_bm25_topk_rank_and_ties(spark, docs_df):
    rows = ranking.bm25_topk(docs_df, ["window"], k=3).collect()
    # doc 1 (3 hits, short) far above doc 0 (1 hit, longer)
    assert [r["doc_id"] for r in rows] == [1, 0]
    assert [r["rank"] for r in rows] == [1, 2]
    assert rows[0]["bm25"] > rows[1]["bm25"] > 0


def test_bm25_validation(spark, docs_df):
    with pytest.raises(ValueError, match="at least one"):
        ranking.bm25_scores(docs_df, [])


def test_rrf_fuse_hand_computed(spark):
    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    vec = spark.createDataFrame(
        [(20, 1), (40, 2), (10, 3)], "doc_id long, rank int"
    )
    rows = ranking.rrf_fuse([lex, vec], k=10).collect()
    got = {r["doc_id"]: (r["rrf_score"], r["n_lists"]) for r in rows}
    want = {
        10: (round(1 / 61 + 1 / 63, 9), 2),
        20: (round(1 / 62 + 1 / 61, 9), 2),
        30: (round(1 / 63, 9), 1),
        40: (round(1 / 62, 9), 1),
    }
    assert got == want
    # ordering: fused score desc, then id
    assert [r["doc_id"] for r in rows] == [20, 10, 40, 30]


def test_rrf_validation(spark):
    with pytest.raises(ValueError, match="at least one"):
        ranking.rrf_fuse([])
