"""Z-order (Morton) clustering layout — multi-column data skipping.

At 100 TB the scan you avoid is worth more than the scan you speed up:
parquet keeps per-row-group min/max statistics for every column, and
both Spark's parquet reader (row-group level) and any lakehouse layout
(file level) prune storage units whose [min, max] cannot satisfy the
filter.  A table sorted by ONE column prunes that column perfectly and
every other column not at all; interleaving the bits of several
columns' bucket ranks (the Morton / Z-order curve — the same layout
Delta's OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite use) makes
row-group min/max ranges tight on ALL participating columns at once,
so selective predicates on ANY of them skip most of the table.

``zorder_key`` is pure Column math (shift/mask/or — whole-stage
codegen, no UDF); ``write_zordered`` stats the columns (one 1-row
aggregate), range-partitions on the key so the curve is contiguous
across files, sorts within partitions, and writes plain parquet that
any reader prunes — no table format required.  Equi-width bucketing on
[min, max] keeps the key computation map-only; a heavily skewed column
wants an equi-depth remap (approxQuantile boundaries) in front, at the
cost of a broadcast lookup — noted, not needed for the fixture data.

``tools/bench_zorder.py`` measures the effect directly from parquet
footers (row groups overlapping a predicate's range), so the claim
"z-order prunes both columns" is a recorded number, not prose
(SCALING.md round-6 additions).

No reference counterpart (the reference's only layout decision is a
pgvector HNSW index) — north-star scope, SURVEY §2.7.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    cols: list[str],
    mins: list[float],
    maxs: list[float],
    bits: int = 10,
) -> Column:
    """Morton key interleaving ``bits`` bucket bits per column.

    Each column is bucketed equi-width into [0, 2^bits) from its
    [min, max] (driver-supplied — one aggregate at write time), then
    bit i of column c lands at output bit ``i * n_cols + c``.  All
    shift/mask/or Column ops — codegen, map-only, no shuffle here (the
    caller decides how to partition on the key).  NULL column values
    bucket to 0 (they cluster together at the curve's origin).
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if not (1 <= bits * len(cols) <= 63):
        raise ValueError(f"bits*len(cols) must fit a long, got {bits * len(cols)}")
    buckets = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = float(hi) - float(lo)
        if span <= 0:  # constant column: every row in bucket 0
            buckets.append(F.lit(0).cast("long"))
            continue
        scaled = (
            (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span)
        ) * F.lit(float((1 << bits) - 1))
        # coalesce BEFORE clamping: least/greatest skip NULL operands,
        # so an un-coalesced NULL would clamp to the max bucket
        b = F.coalesce(F.round(scaled).cast("long"), F.lit(0))
        buckets.append(
            F.greatest(F.lit(0).cast("long"), F.least(F.lit((1 << bits) - 1).cast("long"), b))
        )
    return _interleave(buckets, bits)


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton-interleave pre-computed bucket columns (long, in
    [0, 2^bits)): bit i of bucket c lands at output bit
    ``i * len(buckets) + c``.  Pure shift/mask/or — codegen."""
    n = len(buckets)
    parts = []
    for ci, b in enumerate(buckets):
        for i in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + ci)
            )
    return reduce(lambda a, x: a.bitwiseOR(x), parts).alias("_z")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 10,
    num_files: int = 16,
    rowgroup_bytes: int | None = None,
    bucketing: str = "width",
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of
    ``cols``: one stats pass, a range repartition on the Morton key
    (contiguous curve segments per file — the one shuffle this costs),
    an in-partition sort, and a plain parquet write.  The key column
    itself is dropped; the layout IS the artifact.

    ``bucketing="width"`` (default) buckets each column equi-width from
    its [min, max] — one cheap aggregate, right for near-uniform keys.
    ``bucketing="depth"`` buckets equi-DEPTH from ``approxQuantile``
    boundaries applied by MLlib's ``Bucketizer`` (JVM binary search per
    row, no Python in the key path): under heavy skew an equi-width
    grid piles most rows into a handful of curve cells — each dominated
    row group then spans the hot value AND tail values, so min/max
    pruning dies; quantile buckets put ~equal row counts in every cell
    and the tail stays prunable.  Cost: one approxQuantile pass per
    column at write time; duplicate quantiles (a heavy hitter wider
    than a bucket) collapse, which only coarsens that column's grid.

    ``rowgroup_bytes`` tightens parquet row groups below the default
    128 MiB block (``parquet.block.size``) so row-group pruning has
    granularity at fixture scale; a production table tunes file and
    row-group size with the same knob.
    """
    if bucketing not in ("width", "depth"):
        raise ValueError(f"bucketing must be width|depth, got {bucketing!r}")
    if bucketing == "depth":
        work, bucket_cols = _depth_bucketed(df, cols, bits)
        key = _interleave([F.col(b) for b in bucket_cols], bits)
    else:
        stats = df.agg(
            *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
            *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
        ).collect()[0]
        work = df
        key = zorder_key(
            cols,
            [stats[f"lo_{c}"] for c in cols],
            [stats[f"hi_{c}"] for c in cols],
            bits=bits,
        )
    writer = (
        work.withColumn("_z", key)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .select(*df.columns)
        .write.mode("overwrite")
    )
    if rowgroup_bytes is not None:
        writer = writer.option("parquet.block.size", rowgroup_bytes)
    # Range-partition boundary quality IS layout quality: the sampler's
    # default 100 points/partition occasionally draws degenerate
    # boundaries (its seed varies with session history via the RDD id),
    # which silently produces an unclustered layout — observed as a
    # rare pruning-fraction collapse.  A denser sample costs one cheap
    # extra pass fraction at write time and makes boundaries stable.
    spark = df.sparkSession
    conf_key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    old = spark.conf.get(conf_key, "100")
    try:
        spark.conf.set(conf_key, "1000")
        writer.parquet(path)
    finally:
        spark.conf.set(conf_key, old)


def _depth_bucketed(
    df: DataFrame, cols: list[str], bits: int
) -> tuple[DataFrame, list[str]]:
    """Equi-depth bucket columns for the Z-order key: approxQuantile
    boundaries (driver-side, ≤ 2^bits-1 doubles per column) applied by
    MLlib ``Bucketizer`` — a JVM-side binary search per row, keeping
    the key computation out of Python.  NULLs route through
    handleInvalid="keep" (the extra trailing bucket) and are then
    mapped to bucket 0 so they cluster at the curve origin like the
    equi-width path."""
    from pyspark.ml.feature import Bucketizer

    work = df
    bucket_cols = []
    for i, c in enumerate(cols):
        dcol, bcol = f"_zd_{i}", f"_zb_{i}"
        work = work.withColumn(dcol, F.col(c).cast("double"))
        probs = [j / (1 << bits) for j in range(1, 1 << bits)]
        qs = work.stat.approxQuantile(dcol, probs, 1.0 / (1 << (bits + 2)))
        splits = [float("-inf")] + sorted(set(qs)) + [float("inf")]
        if len(splits) < 3:  # constant column
            work = work.withColumn(bcol, F.lit(0).cast("long"))
            bucket_cols.append(bcol)
            continue
        bz = Bucketizer(
            splits=splits, inputCol=dcol, outputCol=bcol + "_raw",
            handleInvalid="keep",
        )
        work = bz.transform(work).withColumn(
            bcol,
            F.when(F.col(dcol).isNull(), F.lit(0))
            .otherwise(
                F.least(
                    F.col(bcol + "_raw").cast("long"),
                    F.lit((1 << bits) - 1).cast("long"),
                )
            )
            .cast("long"),
        )
        bucket_cols.append(bcol)
    return work, bucket_cols


def rowgroup_ranges(path: str, columns: list[str]) -> list[dict[str, tuple]]:
    """Read parquet footers under ``path``: one dict per row group with
    each requested column's (min, max) statistics — the exact
    information a pruning reader uses.  Driver-side and
    footer-only (no data pages touched); used by tests and
    tools/bench_zorder.py to MEASURE skipping instead of asserting it.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    out: list[dict[str, tuple]] = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        pf = pq.ParquetFile(f)
        for rg in range(pf.metadata.num_row_groups):
            meta = pf.metadata.row_group(rg)
            entry: dict[str, tuple] = {}
            for i in range(meta.num_columns):
                col = meta.column(i)
                name = col.path_in_schema
                if name in columns and col.statistics is not None:
                    entry[name] = (col.statistics.min, col.statistics.max)
            out.append(entry)
    return out


def pruned_fraction(
    ranges: list[dict[str, tuple]], col: str, lo, hi
) -> float:
    """Fraction of row groups a ``col BETWEEN lo AND hi`` predicate can
    skip, given :func:`rowgroup_ranges` output — min/max disjointness,
    the same test the reader applies."""
    if not ranges:
        return 0.0
    skipped = sum(
        1
        for r in ranges
        if col in r and (r[col][1] < lo or r[col][0] > hi)
    )
    return skipped / len(ranges)
