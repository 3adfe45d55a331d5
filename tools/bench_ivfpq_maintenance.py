"""Measure IVF-PQ index maintenance (append vs rebuild) and filtered-probe
recall vs nprobe.

Usage: python tools/bench_ivfpq_maintenance.py [corpus_dir] [reps]

Two questions a 100 TB operator asks of the ANN index:

1. **What does adding data cost?**  `append_to_ivfpq_index` encodes the
   increment with the frozen model and appends partition files —
   O(increment).  The alternative is a full rebuild — O(corpus).  Both
   timed on a 90/10 split of the corpus.

2. **What does a metadata filter cost in recall?**  `ivf_search(pred=)`
   filters inside the probed cells (post-filtering); matching rows in
   unprobed cells are unreachable, so recall under a ~10 %-selective
   label predicate is a function of nprobe.  Measured against the exact
   filtered scan.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    work = "/tmp/ivfpq_maint"

    from readwise_vector_db_spark.functions.vector import cosine_distance
    from readwise_vector_db_spark.operators import pq
    from readwise_vector_db_spark.operators import similarity as sim
    from readwise_vector_db_spark.operators.search import vector_literal
    from readwise_vector_db_spark.session import get_spark

    spark = get_spark("bench_ivfpq_maint")
    embs = spark.read.parquet(f"{corpus_dir}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )
    n = embs.count()
    cut = int(n * 0.9)
    seed = embs.filter(F.col("vec_id") % 10 != 9)
    incr = embs.filter(F.col("vec_id") % 10 == 9)
    n_seed, n_incr = seed.count(), incr.count()
    print(f"# corpus {corpus_dir}: n={n} seed={n_seed} incr={n_incr}", flush=True)

    # ---- 1. append vs rebuild ------------------------------------------
    app_walls, reb_walls = [], []
    for _ in range(reps):
        shutil.rmtree(work, ignore_errors=True)
        _, centroids = sim.build_ivf_index(seed, n_clusters=16)
        books = pq.train_pq_codebooks(seed, m=8, k=256, sample_rows=5000)
        pq.save_ivfpq_index(
            pq.ivfpq_encode(seed, centroids, books), centroids, books,
            f"{work}/idx",
        )
        spark.catalog.clearCache()
        t0 = time.monotonic()
        added = pq.append_to_ivfpq_index(incr, f"{work}/idx")
        app_walls.append(time.monotonic() - t0)
        assert added == n_incr
        spark.catalog.clearCache()
        t0 = time.monotonic()
        _, c2 = sim.build_ivf_index(embs, n_clusters=16)
        b2 = pq.train_pq_codebooks(embs, m=8, k=256, sample_rows=5000)
        pq.save_ivfpq_index(
            pq.ivfpq_encode(embs, c2, b2), c2, b2, f"{work}/rebuilt"
        )
        reb_walls.append(time.monotonic() - t0)
    print(
        json.dumps(
            {
                "metric": "append_vs_rebuild",
                "append_min_s": round(min(app_walls), 3),
                "rebuild_min_s": round(min(reb_walls), 3),
                "increment_rows": n_incr,
                "corpus_rows": n,
            }
        ),
        flush=True,
    )

    # appended index must answer like the monolithic one at the planted row
    codes, cents, bks = pq.load_ivfpq_index(spark, f"{work}/idx")
    q0 = incr.first()
    got = pq.ivfpq_search(
        codes, cents, bks, [float(x) for x in q0["embedding"]], k=5, nprobe=4,
        rescore=embs, rescore_factor=8,
    ).collect()
    assert any(r["vec_id"] == q0["vec_id"] and r["score"] == 1.0 for r in got), got

    # ---- 2. filtered-probe recall vs nprobe ----------------------------
    assigned, centroids = sim.build_ivf_index(embs, n_clusters=16)
    assigned = assigned.persist()
    assigned.count()
    qrows = embs.filter(F.col("vec_id") < 5).collect()

    def exact_filtered(qv, lab, k=10):
        q_lit = vector_literal(qv)
        acc = 0.0
        for x in qv:
            acc += float(x) * float(x)
        return [
            r["vec_id"]
            for r in embs.filter(F.col("label") == lab)
            .select(
                "vec_id",
                F.round(
                    cosine_distance(
                        F.col("embedding"), q_lit, b_norm=F.lit(acc**0.5)
                    ),
                    6,
                ).alias("d"),
            )
            .orderBy(F.asc("d"), F.asc("vec_id"))
            .limit(k)
            .collect()
        ]

    # ~10 % selectivity (label equality) and ~0.1 % (label + id stripe):
    # the second is the starvation regime — matching rows per probed cell
    # drop near/below k, so unprobed cells hold unreachable true hits.
    preds = {
        "sel_10pct": lambda lab: F.col("label") == F.lit(lab),
        "sel_0.1pct": lambda lab: (F.col("label") == F.lit(lab))
        & (F.col("vec_id") % 100 == 0),
    }

    def exact_pred(qv, cond, k=10):
        q_lit = vector_literal(qv)
        acc = 0.0
        for x in qv:
            acc += float(x) * float(x)
        return [
            r["vec_id"]
            for r in embs.filter(cond)
            .select(
                "vec_id",
                F.round(
                    cosine_distance(
                        F.col("embedding"), q_lit, b_norm=F.lit(acc**0.5)
                    ),
                    6,
                ).alias("d"),
            )
            .orderBy(F.asc("d"), F.asc("vec_id"))
            .limit(k)
            .collect()
        ]

    for pname, pf in preds.items():
        for nprobe in (2, 4, 8, 16):
            recalls, walls = [], []
            for r in qrows:
                qv = [float(x) for x in r["embedding"]]
                lab = int(r["label"])
                want = set(exact_pred(qv, pf(lab)))
                if not want:
                    continue
                t0 = time.monotonic()
                got = {
                    x["neighbor_id"]
                    for x in sim.ivf_search(
                        assigned, centroids, qv, k=10, nprobe=nprobe,
                        # pin the INDEX path: this sweep measures the
                        # starvation curve the router exists to avoid
                        pred=pf(lab), route_filtered=False,
                    ).collect()
                }
                walls.append(time.monotonic() - t0)
                recalls.append(len(got & want) / len(want))
            print(
                json.dumps(
                    {
                        "metric": "filtered_recall",
                        "pred": pname,
                        "nprobe": nprobe,
                        "recall_at_10": round(sum(recalls) / len(recalls), 3),
                        "probe_mean_s": round(sum(walls) / len(walls), 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
