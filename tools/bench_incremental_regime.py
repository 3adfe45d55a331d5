"""Incremental-dedup layout A/B in the regime the bucketed index exists
for (round-5 verdict item 7).

The ×10 replica corpus measured both layouts equivalent because 90 % of
each increment collapses IN-BATCH before any store probe — the band
table that reaches the store join is tiny either way.  This bench
builds the opposite corpus: every document DISTINCT text (a 10 % seeded
near-dup replay provides the drops), so the increment's full band table
— n_docs × 16 bands × 64-long signatures — must either be BROADCAST to
every task (the explicit-hint layout) or shuffled once into the store
index's bucketing (the bucketed layout).  That band table is what
outgrows broadcast at production increment sizes.

Usage:  python tools/bench_incremental_regime.py [n_seed] [n_inc] [reps]
Prints one line per (layout, phase) with min/all walls; store dirs are
fresh per rep under /tmp.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from readwise_vector_db_spark.jobs.incremental_dedup import (  # noqa: E402
    dedup_batch_against_store,
)
from readwise_vector_db_spark.session import get_spark  # noqa: E402
from readwise_vector_db_spark.sources.versioned import VersionedTable  # noqa: E402


def distinct_docs(spark, n: int, id_offset: int = 0, replay_pct: int = 0):
    """n documents of ~30 pseudo-words, every text distinct (deterministic
    hash words — fully JVM-side generation, no driver loop).  With
    ``replay_pct``, that percentage of rows re-uses the text of an id
    from the FIRST block (historical near/exact dups for the store to
    catch)."""
    base = spark.range(n).select((F.col("id") + id_offset).alias("doc_id"))
    # text seed: replayed rows point at an earlier id's seed → identical text
    seed = F.when(
        (F.col("doc_id") % 100) < replay_pct, F.col("doc_id") % 1000
    ).otherwise(F.col("doc_id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        lambda i: F.conv(
            (F.abs(F.xxhash64(seed * 1000 + i)) % 60466176).cast("string"), 10, 36
        ),
    )
    return base.select("doc_id", F.array_join(words, " ").alias("text"))


def run(layout: str, n_seed: int, n_inc: int, rep: int) -> tuple[float, float, dict]:
    spark = get_spark("inc_regime")
    root = f"/tmp/inc_regime_{layout}_{rep}"
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedTable(root)
    seed_df = distinct_docs(spark, n_seed).persist()
    seed_df.count()
    t0 = time.perf_counter()
    dedup_batch_against_store(spark, seed_df, table, batch_join=layout)
    t_seed = time.perf_counter() - t0
    inc_df = distinct_docs(spark, n_inc, id_offset=10_000_000, replay_pct=10).persist()
    inc_df.count()
    t0 = time.perf_counter()
    stats = dedup_batch_against_store(spark, inc_df, table, batch_join=layout)
    t_inc = time.perf_counter() - t0
    seed_df.unpersist()
    inc_df.unpersist()
    if layout == "bucketed":
        from readwise_vector_db_spark.jobs.incremental_dedup import _band_table_name

        spark.sql(f"DROP TABLE IF EXISTS {_band_table_name(root)}")
    shutil.rmtree(root, ignore_errors=True)
    return t_seed, t_inc, stats


def main() -> None:
    n_seed = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    n_inc = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    for layout in ("broadcast", "bucketed"):
        seeds, incs, stats = [], [], None
        for rep in range(reps):
            s, i, stats = run(layout, n_seed, n_inc, rep)
            seeds.append(round(s, 2))
            incs.append(round(i, 2))
        print(
            f"{layout}: seed_min={min(seeds)} inc_min={min(incs)}"
            f" seeds={seeds} incs={incs} accepted={stats['accepted']}"
            f" (batch_raw={stats['batch_raw']})",
            flush=True,
        )


if __name__ == "__main__":
    main()
