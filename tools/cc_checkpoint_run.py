"""Measure dedup_clusters with RELIABLE checkpointing — the 100 TB config.

``connected_components`` defaults to ``localCheckpoint`` (executor-local
blocks: fast, but one lost executor mid-iteration kills the job).  The
configuration a 1000-executor run actually ships with is
``checkpoint_dir=`` → reliable ``checkpoint()`` into shared storage,
which costs a write per round.  This tool runs the exact dedup_clusters
edge build + cluster resolution with that path enabled and reports wall
time, per-round checkpoint artifacts, and bytes written — the numbers
SCALING.md's appendix cites.

Usage: python tools/cc_checkpoint_run.py [sf_dir] [checkpoint_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ckpt = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cc_ckpt"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark.sql import functions as F

    from readwise_vector_db_spark.functions.text import fingerprint_md5
    from readwise_vector_db_spark.operators import dedup as dd
    from readwise_vector_db_spark.operators.graph import resolve_clusters
    from readwise_vector_db_spark.session import get_spark
    from readwise_vector_db_spark.suites.dedup import _augmented_docs

    spark = get_spark("cc_checkpoint")
    shutil.rmtree(ckpt, ignore_errors=True)
    # same one-time warmup as bench.py: codegen infra + noop committer,
    # so the wall below measures the query + checkpoint writes, not JVM
    # session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").groupBy("r_name").count().write.format(
        "noop"
    ).mode("overwrite").save()

    # identical edge construction to suites/curation.py:dedup_clusters
    docs = _augmented_docs(spark, sf_dir).persist()
    fps = docs.select("doc_id", fingerprint_md5("text").alias("fp")).persist()
    groups = fps.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    exact_edges = (
        fps.join(groups, "fp")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select(F.col("keep_id").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    reps = docs.join(
        F.broadcast(groups.select(F.col("keep_id").alias("doc_id"))),
        "doc_id",
        "left_semi",
    )
    mh_edges = dd.minhash_lsh_pairs(reps, threshold=0.6, base_hash="md5").select(
        "id_a", "id_b"
    )
    edges = exact_edges.unionByName(mh_edges)

    # two reps, caches carried across them — the same methodology as
    # bench.py's dedup_clusters reps, so wall_warm_sec is directly
    # comparable to the localCheckpoint number in BENCH/SCALING: the
    # first rep pays codegen + cache materialization (one-time per
    # executor JVM); the second isolates the per-invocation cost with
    # the reliable-checkpoint config.  Artifacts counted on the last rep.
    walls = []
    n = 0
    for _ in range(2):
        shutil.rmtree(ckpt, ignore_errors=True)
        t0 = time.perf_counter()
        out = resolve_clusters(edges, distinct_edges=False, checkpoint_dir=ckpt)
        n = out.count()
        walls.append(round(time.perf_counter() - t0, 2))

    # one rdd-N dir per lineage truncation (init labels + one per round)
    rdd_dirs, total_bytes = [], 0
    for root, _dirs, files in os.walk(ckpt):
        for f in files:
            total_bytes += os.path.getsize(os.path.join(root, f))
        if os.path.basename(root).startswith("rdd-"):
            rdd_dirs.append(root)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "rows": n,
                "wall_cold_sec": walls[0],
                "wall_warm_sec": walls[-1],
                "checkpoints": len(rdd_dirs),
                "checkpoint_mib": round(total_bytes / 1048576, 2),
            }
        )
    )
    shutil.rmtree(ckpt, ignore_errors=True)


if __name__ == "__main__":
    main()
