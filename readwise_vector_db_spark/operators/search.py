"""Semantic search: the reference's core query path, Spark-first.

Reproduces ``semantic_search`` (reference ``core/search.py:189-249``) and
the SQL builder (``db/supabase_ops.py:230-295``):

    embed query → WHERE embedding IS NOT NULL
                  [AND source_type = ?] [AND source_author = ?]
                  [AND tags && ?] [AND highlighted_at BETWEEN ? AND ?]
    → score = embedding <=> query   (cosine distance)
    → ORDER BY score LIMIT k        (k clamped 1..100, api/routes.py:100)

Spark mapping:

- The filter chain is plain ``.filter`` calls — Catalyst conjuncts them
  and pushes them into the Parquet scan (PushedFilters), so at 100 TB a
  ``source_type = 'x'`` predicate prunes row groups before any vector
  math happens.  (The reference's Supabase path applies the date filter
  AFTER the limit — a semantics bug, ``core/search.py:91-114``; we use
  correct pre-limit semantics.)
- Scoring is a JVM-side fold (functions/vector.py) over a *literal*
  query vector: the query embedding is inlined into the plan as an
  ``array`` literal, so every executor evaluates it without a broadcast
  round-trip; with precomputed ``emb_norm`` the per-row cost is one
  fused multiply-add loop inside whole-stage codegen.
- ``orderBy(score).limit(k)`` compiles to ``TakeOrderedAndProject``:
  each partition keeps a k-row heap and the driver merges — no global
  sort, no shuffle.  This is the exact-scan baseline; the ANN scale path
  (IVF partition pruning) lives in operators/similarity.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from readwise_vector_db_spark.functions.vector import cosine_distance, l2_norm

K_DEFAULT = 20  # reference api/routes.py:100
K_MIN, K_MAX = 1, 100
SCORE_DECIMALS = 6  # stabilizes oracle hashing across engines


@dataclass
class SearchParams:
    """Validated search request (reference ``models/api.py:7-15``)."""

    k: int = K_DEFAULT
    source_type: str | None = None
    source_author: str | None = None
    lang: str | None = None
    tags: Sequence[str] | None = None
    highlighted_at_range: tuple[date | str, date | str] | None = None
    extra_filters: list[Column] = field(default_factory=list)

    def clamped_k(self) -> int:
        return max(K_MIN, min(K_MAX, self.k))


def vector_literal(vec: Sequence[float]) -> Column:
    """Inline a query vector as an array<double> literal (no broadcast needed)."""
    return F.array(*[F.lit(float(x)) for x in vec]).cast("array<double>")


def apply_filters(df: DataFrame, params: SearchParams) -> DataFrame:
    """The conjunctive filter surface F1-F7 (SURVEY §2.2), pre-limit."""
    df = df.filter(F.col("embedding").isNotNull())  # F1
    if params.source_type is not None:  # F2
        df = df.filter(F.col("source_type") == params.source_type)
    if params.source_author is not None and "source_author" in df.columns:  # F3
        df = df.filter(F.col("source_author") == params.source_author)
    if params.lang is not None and "lang" in df.columns:
        df = df.filter(F.col("lang") == params.lang)
    if params.tags:  # F4: ANY-overlap, matches Postgres `&&`
        df = df.filter(
            F.arrays_overlap(F.col("tags"), F.array(*[F.lit(t) for t in params.tags]))
        )
    if params.highlighted_at_range is not None and "highlighted_at" in df.columns:  # F5
        lo, hi = params.highlighted_at_range
        df = df.filter(F.col("highlighted_at").between(F.lit(lo), F.lit(hi)))
    for extra in params.extra_filters:
        df = df.filter(extra)
    return df


def score_column(query_vec: Sequence[float] | Column, use_norm: bool = True) -> Column:
    """Cosine distance to the query as a rounded double column."""
    q = vector_literal(query_vec) if not isinstance(query_vec, Column) else query_vec
    norm = F.col("emb_norm") if use_norm else None
    return F.round(cosine_distance(F.col("embedding"), q, a_norm=norm), SCORE_DECIMALS)


def semantic_search(
    highlights: DataFrame,
    query_vec: Sequence[float] | Column,
    params: SearchParams | None = None,
) -> DataFrame:
    """Top-k cosine search with metadata filters; returns scored rows ascending.

    Ties broken by id for deterministic output (SURVEY §7 hard-part 1).
    """
    params = params or SearchParams()
    use_norm = "emb_norm" in highlights.columns
    df = apply_filters(highlights, params)
    df = df.withColumn("score", score_column(query_vec, use_norm=use_norm))
    out_cols = [c for c in df.columns if c not in ("embedding", "emb_norm")]
    return df.select(*out_cols).orderBy(F.asc("score"), F.asc("id")).limit(params.clamped_k())


def query_vector_for_id(highlights: DataFrame, qid: str) -> list[float]:
    """Fetch one stored embedding to use as the query vector (test/oracle path)."""
    row = highlights.filter(F.col("id") == qid).select("embedding").first()
    if row is None or row[0] is None:
        raise KeyError(f"no embedding for id {qid!r}")
    return list(row[0])
