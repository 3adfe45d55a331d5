"""SemDeDup build-vs-apply timing split (round-5 verdict item 3).

Measures, on the same augmented sf corpus the ``dedup_semantic`` query
uses: (a) quantizer BUILD (KMeans via train_semantic_quantizer),
(b) APPLY with a pre-trained quantizer (assign_cells probe — the path
``dedup_semantic_probe`` serves), and (c) the legacy fused call
(per-call KMeans).  Min over reps; caches drained between reps.

Usage: python tools/bench_semdedup_split.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from readwise_vector_db_spark.operators import dedup as dd  # noqa: E402
from readwise_vector_db_spark.operators.dedup import release_detector_cache  # noqa: E402
from readwise_vector_db_spark.session import get_spark  # noqa: E402
from readwise_vector_db_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("semdedup_split")
    embs = load_table(spark, sf_dir, "embeddings")
    dups = embs.filter(F.col("vec_id") % 20 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1000000
    )
    aug = embs.unionByName(dups)

    build_t, apply_t, fused_t = [], [], []
    q = None
    for _ in range(reps):
        release_detector_cache()
        t0 = time.perf_counter()
        q = dd.train_semantic_quantizer(aug)
        build_t.append(time.perf_counter() - t0)

        release_detector_cache()
        t0 = time.perf_counter()
        n = dd.semantic_dedup_pairs(aug, threshold=0.999, quantizer=q).count()
        apply_t.append(time.perf_counter() - t0)

        release_detector_cache()
        t0 = time.perf_counter()
        n_fused = dd.semantic_dedup_pairs(aug, threshold=0.999).count()
        fused_t.append(time.perf_counter() - t0)
        assert n == n_fused, (n, n_fused)

    fmt = lambda xs: f"min={min(xs):.2f} reps={[round(x, 2) for x in xs]}"  # noqa: E731
    print(f"build(KMeans): {fmt(build_t)}")
    print(f"apply(probe):  {fmt(apply_t)}")
    print(f"fused(legacy): {fmt(fused_t)}")
    print(f"pairs={n}")


if __name__ == "__main__":
    main()
