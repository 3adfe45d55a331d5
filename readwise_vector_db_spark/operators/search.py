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

import math
from dataclasses import dataclass, field
from datetime import date, datetime
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


def vector_literal_sql(vec: Sequence[float]) -> str:
    """SQL text of a query vector as an array<double> literal, encoded as
    ONE string literal + ``split`` + an array cast: the parser/analyzer
    sees 3 expression nodes instead of one cast node per component, and
    the optimizer constant-folds the whole thing to a literal array once.
    Measured per request (build + analyze + 1-row exec): 3072-d 170 →
    80 ms, 64-d 113 → 64 ms vs the per-element ``cast('…' as double)``
    encoding; ``F.lit(list)`` and parameterized SQL are ~1.4 s at 3072-d
    (py4j per-element literal conversion).

    ``repr`` round-trips each double exactly and Spark's string→double
    cast parses full precision, so the folded literal is bit-identical
    to the per-element ``F.lit`` construction (pinned in
    tests/test_search.py)."""
    if not len(vec):
        return "cast(array() as array<double>)"
    s = ",".join(repr(float(x)) for x in vec)
    return f"cast(split('{s}', ',') as array<double>)"


def vector_literal(vec: Sequence[float]) -> Column:
    """Inline a query vector as an array<double> literal (no broadcast
    needed).  Built as ONE JVM-parsed expr: per-element ``F.lit`` costs
    a py4j round-trip per component — ~100 ms of pure driver latency at
    64-d, and 3072 round-trips for a real embedding — which dominated
    the measured warm-request latency."""
    return F.expr(vector_literal_sql(vec))


def apply_filters(df: DataFrame, params: SearchParams) -> DataFrame:
    """The conjunctive filter surface F1-F7 (SURVEY §2.2), pre-limit."""
    df = df.filter(F.col("embedding").isNotNull())  # F1
    return apply_meta_filters(df, params)


def has_meta_filters(params: SearchParams) -> bool:
    return bool(
        params.source_type is not None
        or params.source_author is not None
        or params.lang is not None
        or params.tags
        or params.highlighted_at_range is not None
        or params.extra_filters
    )


def missing_filter_columns(params: SearchParams, columns: Sequence[str]) -> list[str]:
    """Filter columns ``params`` requests that ``columns`` lacks.

    The filter surface is column-gated so one params model serves both
    the highlights corpus (source_author / highlighted_at present) and
    the documents corpus (absent) — but a requested filter whose column
    the corpus lacks must FAIL LOUDLY, not silently return unfiltered
    results (round-9 contract; the reference applies its filters
    unconditionally against a fixed schema — core/search.py:50-103 —
    so a missing column there is a hard error, never a silent skip)."""
    need: list[str] = []
    if params.source_type is not None and "source_type" not in columns:  # F2
        need.append("source_type")
    if params.source_author is not None and "source_author" not in columns:  # F3
        need.append("source_author")
    if params.lang is not None and "lang" not in columns:
        need.append("lang")
    if params.tags and "tags" not in columns:  # F4
        need.append("tags")
    if (
        params.highlighted_at_range is not None
        and "highlighted_at" not in columns
    ):  # F5
        need.append("highlighted_at")
    return need


def require_filter_columns(params: SearchParams, columns: Sequence[str]) -> None:
    """Raise ``ValueError`` naming every requested filter column the
    corpus lacks — the loud twin of the silent drop this replaced."""
    missing = missing_filter_columns(params, columns)
    if missing:
        raise ValueError(
            f"filter column(s) {missing} not present in this corpus "
            f"(available: {sorted(columns)}); refusing to serve "
            "silently-unfiltered results"
        )


def apply_meta_filters(df: DataFrame, params: SearchParams) -> DataFrame:
    """F2-F7: the metadata-side filters (everything except the F1 null
    guard).  A filter on a column the corpus lacks raises (round 9 —
    previously it was silently dropped, returning unfiltered rows)."""
    require_filter_columns(params, df.columns)
    if params.source_type is not None:  # F2
        df = df.filter(F.col("source_type") == params.source_type)
    if params.source_author is not None:  # F3
        df = df.filter(F.col("source_author") == params.source_author)
    if params.lang is not None:
        df = df.filter(F.col("lang") == params.lang)
    if params.tags:  # F4: ANY-overlap, matches Postgres `&&`
        df = df.filter(
            F.arrays_overlap(F.col("tags"), F.array(*[F.lit(t) for t in params.tags]))
        )
    if params.highlighted_at_range is not None:  # F5
        lo, hi = params.highlighted_at_range
        df = df.filter(F.col("highlighted_at").between(F.lit(lo), F.lit(hi)))
    for extra in params.extra_filters:
        df = df.filter(extra)
    return df


def query_norm(query_vec: Sequence[float]) -> float:
    """Driver-side L2 norm of the query vector.  Plain sequential fold,
    NOT ``math.fsum``: must reproduce the same IEEE-754 accumulation
    order as the in-engine ``aggregate()`` / DuckDB ``list_dot_product``."""
    acc = 0.0
    for x in query_vec:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def sql_quote(s: str) -> str:
    """Escape a string for a single-quoted Spark SQL literal."""
    return str(s).replace("\\", "\\\\").replace("'", "''")


def score_sql(query_vec: Sequence[float], norm_col: str = "emb_norm") -> str:
    """SQL text of ``score_column`` for a plain query vector — the same
    rounded cosine distance as one parser-bound string, for serving paths
    that build per-request plans with a single ``spark.sql`` round-trip
    instead of ~a dozen py4j expression-tree calls (measured ~90 ms of
    driver latency per warm request at 64-d; see sources/search_index.py).

    Expression-for-expression the DataFrame twin: ``1.0D - CASE WHEN
    denom > 0 THEN dot/denom END`` with the query norm folded driver-side
    (Catalyst does not constant-fold ``aggregate`` over array literals).
    Bitwise parity with ``score_column`` is pinned in
    tests/test_search_serving.py."""
    qn = f"cast('{query_norm(query_vec)!r}' as double)"
    denom = f"({norm_col} * {qn})"
    dot = (
        f"aggregate(zip_with(cast(embedding as array<double>), "
        f"{vector_literal_sql(query_vec)}, (x, y) -> x * y), "
        f"0.0D, (acc, x) -> acc + x)"
    )
    return (
        f"round(1.0D - (CASE WHEN {denom} > 0.0D THEN {dot} / {denom} END), "
        f"{SCORE_DECIMALS})"
    )


def meta_filter_sql(params: SearchParams, columns: Sequence[str]) -> str | None:
    """WHERE-fragment twin of ``apply_meta_filters`` (F2-F7), with the
    same loud missing-column contract (a requested filter whose column
    ``columns`` lacks raises — round 9; it was silently dropped before).
    Returns None when no metadata filter applies.  ``extra_filters`` are
    arbitrary Columns — not renderable to SQL text; callers with extras
    must use the DataFrame path."""
    if params.extra_filters:
        raise ValueError("extra_filters are not SQL-renderable")
    require_filter_columns(params, columns)
    conj: list[str] = []
    if params.source_type is not None:  # F2
        conj.append(f"source_type = '{sql_quote(params.source_type)}'")
    if params.source_author is not None:  # F3
        conj.append(f"source_author = '{sql_quote(params.source_author)}'")
    if params.lang is not None:
        conj.append(f"lang = '{sql_quote(params.lang)}'")
    if params.tags:  # F4
        tag_arr = ", ".join(f"'{sql_quote(t)}'" for t in params.tags)
        conj.append(f"arrays_overlap(tags, array({tag_arr}))")
    if params.highlighted_at_range is not None:  # F5
        lo, hi = params.highlighted_at_range

        def lit(v) -> str:
            # typed literals matching F.lit(value); datetime FIRST —
            # it subclasses date, and rendering it as DATE would
            # silently truncate the time component
            if isinstance(v, datetime):
                return f"TIMESTAMP '{v}'"
            if isinstance(v, date):
                return f"DATE '{v.isoformat()}'"
            return f"'{sql_quote(str(v))}'"

        conj.append(f"highlighted_at BETWEEN {lit(lo)} AND {lit(hi)}")
    return " AND ".join(conj) if conj else None


def score_column(query_vec: Sequence[float] | Column, use_norm: bool = True) -> Column:
    """Cosine distance to the query as a rounded double column.

    When the query is a plain vector its norm is computed driver-side and
    inlined as a literal: Catalyst does not constant-fold ``aggregate``
    over array literals, so leaving it symbolic would re-fold the 3072-elem
    query norm for EVERY corpus row (twice — once in the zero-guard, once
    in the denominator).
    """
    norm = F.col("emb_norm") if use_norm else None
    if isinstance(query_vec, Column):
        return F.round(
            cosine_distance(F.col("embedding"), query_vec, a_norm=norm), SCORE_DECIMALS
        )
    q = vector_literal(query_vec)
    q_norm = F.lit(query_norm(query_vec))
    return F.round(
        cosine_distance(F.col("embedding"), q, a_norm=norm, b_norm=q_norm),
        SCORE_DECIMALS,
    )


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


def semantic_search_indexed(
    metadata: DataFrame,
    vectors: DataFrame,
    query_vec: Sequence[float] | Column,
    params: SearchParams | None = None,
) -> DataFrame:
    """Vector-first top-k: the scale plan for ``semantic_search``.

    ``semantic_search`` joins metadata to every vector before scoring —
    at 100 TB that shuffles the text payload of the whole corpus only for
    top-k to discard all but k rows.  This plan keeps the score stage on
    the narrow ``vectors`` table (sources/tables.py:corpus_split):

    1. metadata filters (F2-F7) reduce ``metadata`` to an id set, which
       semi-joins into ``vectors`` — only ids cross the wire, and only
       when a filter exists.  On a cluster both tables are bucketed by id,
       so this semi-join is co-located (zero shuffle).
    2. score + ``TakeOrderedAndProject`` over (id, score): per-partition
       k-row heaps, driver merge — no sort, no shuffle, scan reads only
       the vector columns (ReadSchema pruning).
    3. the k winners join back to ``metadata`` for shaping: a k-row
       broadcast, regardless of corpus size.

    Requires every vector id to have a metadata row (join-after-limit
    correctness; the fixture generator guarantees vec_id ⊆ doc_id).
    """
    params = params or SearchParams()
    k = params.clamped_k()
    vec = vectors.filter(F.col("embedding").isNotNull())  # F1
    if has_meta_filters(params):
        allowed = apply_meta_filters(metadata, params).select("id")
        vec = vec.join(allowed, "id", "left_semi")
    use_norm = "emb_norm" in vec.columns
    topk = (
        vec.withColumn("score", score_column(query_vec, use_norm=use_norm))
        .select("id", "score")
        .orderBy(F.asc("score"), F.asc("id"))
        .limit(k)
    )
    out_cols = [c for c in metadata.columns if c not in ("embedding", "emb_norm")]
    return (
        F.broadcast(topk)
        .join(metadata, "id")
        .select(*out_cols, "score")
        .orderBy(F.asc("score"), F.asc("id"))
    )


def semantic_search_stored(
    metadata: DataFrame,
    vectors: DataFrame,
    query_id: str,
    params: SearchParams | None = None,
) -> DataFrame:
    """``semantic_search_indexed`` for a STORED query embedding, with no
    driver round-trip: instead of ``.first()``-ing the query vector to the
    driver and inlining it (one extra Spark job per search), the 1-row
    query side joins in as a broadcast.  Norms are precomputed per side,
    so the scan still does one fold per row.
    """
    params = params or SearchParams()
    k = params.clamped_k()
    use_norm = "emb_norm" in vectors.columns
    q = F.broadcast(
        vectors.filter(F.col("id") == query_id).select(
            F.col("embedding").alias("qv"),
            (F.col("emb_norm") if use_norm else l2_norm("embedding")).alias("q_norm"),
        )
    )
    vec = vectors.filter(F.col("embedding").isNotNull())  # F1
    if has_meta_filters(params):
        allowed = apply_meta_filters(metadata, params).select("id")
        vec = vec.join(allowed, "id", "left_semi")
    score = F.round(
        cosine_distance(
            F.col("embedding"),
            F.col("qv"),
            a_norm=F.col("emb_norm") if use_norm else None,
            b_norm=F.col("q_norm"),
        ),
        SCORE_DECIMALS,
    )
    topk = (
        vec.crossJoin(q)
        .withColumn("score", score)
        .select("id", "score")
        .orderBy(F.asc("score"), F.asc("id"))
        .limit(k)
    )
    out_cols = [c for c in metadata.columns if c not in ("embedding", "emb_norm")]
    return (
        F.broadcast(topk)
        .join(metadata, "id")
        .select(*out_cols, "score")
        .orderBy(F.asc("score"), F.asc("id"))
    )


def winner_score_map_sql(winners) -> str:
    """``map('id', score, ...)`` SQL text for a collected winner list.
    A zero-norm corpus vector scores NULL (cosine has no direction) —
    it must stay a NULL literal, exactly like ``F.lit(None)`` would."""

    def sql_double(v) -> str:
        return "cast(null as double)" if v is None else f"cast('{float(v)!r}' as double)"

    return (
        "map("
        + ", ".join(
            f"'{sql_quote(r['id'])}', {sql_double(r['score'])}" for r in winners
        )
        + ")"
    )


def winner_in_list_sql(winners) -> str:
    return ", ".join(f"'{sql_quote(r['id'])}'" for r in winners)


def semantic_search_served(
    metadata: DataFrame,
    vectors: DataFrame,
    query_vec: Sequence[float] | Column,
    params: SearchParams | None = None,
) -> DataFrame:
    """Serving-path top-k over the warm layout: the minimal-job plan.

    ``semantic_search_indexed`` shapes the winners with a broadcast join
    (broadcast build job + join job + a range-partitioned sort of k
    rows).  A warm serving path doesn't need any of that: the k winners
    are driver-sized *by construction* (k clamped to 100), so:

    1. score the narrow vectors table; ``TakeOrderedAndProject`` brings
       the k (id, score) winners to the driver — one job, no shuffle;
    2. fetch exactly those k metadata rows with an ``IN`` predicate that
       reaches the parquet scan (PushedFilters → row-group pruning; on
       a sorted bucketed layout that is a near-point lookup), attaching
       scores as a literal map — one job, no broadcast, and the final
       k-row sort runs in the single result partition (no Exchange).

    The driver-side winner list is the same k rows the driver would
    collect from the result anyway — not a hidden scale risk.
    """
    params = params or SearchParams()
    k = params.clamped_k()
    vec = vectors.filter(F.col("embedding").isNotNull())  # F1
    if has_meta_filters(params):
        allowed = apply_meta_filters(metadata, params).select("id")
        vec = vec.join(allowed, "id", "left_semi")
    use_norm = "emb_norm" in vectors.columns
    winners = (
        vec.withColumn("score", score_column(query_vec, use_norm=use_norm))
        .select("id", "score")
        .orderBy(F.asc("score"), F.asc("id"))
        .limit(k)
        .collect()
    )
    out_cols = [c for c in metadata.columns if c not in ("embedding", "emb_norm")]
    if not winners:
        return (
            metadata.select(*out_cols)
            .withColumn("score", F.lit(None).cast("double"))
            .limit(0)
        )
    # both winner-list expressions as single JVM-parsed exprs (k ≤ 100,
    # so the SQL strings are small; per-element F.lit would cost 2k+k
    # py4j round-trips per request on the serving hot path)
    score_map = F.expr(winner_score_map_sql(winners))
    in_list = winner_in_list_sql(winners)
    return (
        metadata.filter(F.expr(f"id IN ({in_list})"))
        .withColumn("score", score_map[F.col("id")])
        .select(*out_cols, "score")
        .coalesce(1)
        .sortWithinPartitions(F.asc("score"), F.asc("id"))
    )


def query_vector_for_id(highlights: DataFrame, qid: str) -> list[float]:
    """Fetch one stored embedding to use as the query vector (test/oracle path)."""
    row = highlights.filter(F.col("id") == qid).select("embedding").first()
    if row is None or row[0] is None:
        raise KeyError(f"no embedding for id {qid!r}")
    return list(row[0])
