"""Measure bm25_topk's map-only TF design vs the textbook explode pipeline.

Usage: python tools/bench_bm25.py [corpus_dir] [reps]

The operator computes Q per-term TFs as array-filter counts in one
map-only pass; the textbook alternative explodes every token, shuffles
on (doc, term) for TF and on term for DF, and joins the pieces back.
Both produce identical top-k rows (asserted per rep).  Min of reps,
caches drained.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def naive_bm25_topk(docs, terms, k=10, k1=1.2, b=0.75):
    """Explode → shuffle TF → shuffle DF → join — the plan bm25_topk avoids."""
    from readwise_vector_db_spark.functions.text import ws_tokens

    toks = docs.select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("term")
    )
    dl = docs.select(
        "doc_id", F.size(ws_tokens(F.lower(F.col("text")))).alias("dl")
    )
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )
    contrib = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n") - F.col("df").cast("double") + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5))
        )
        * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl"))
        ),
        9,
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("_c", contrib)
        .groupBy("doc_id")
        .agg(F.round(F.sum("_c"), 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(k)


def main() -> None:
    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from readwise_vector_db_spark.operators import ranking
    from readwise_vector_db_spark.session import get_spark

    spark = get_spark("bench_bm25")
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    terms = ["spark", "query", "window", "merge"]
    print(f"# corpus {corpus_dir}: n_docs={n} terms={terms}", flush=True)

    variants = {
        "map_only": lambda: ranking.bm25_topk(docs, terms, k=10)
        .select("doc_id", "bm25")
        .collect(),
        "explode_shuffle": lambda: naive_bm25_topk(docs, terms, k=10).collect(),
    }
    want = None
    for name, fn in variants.items():
        walls = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            rows = fn()
            walls.append(time.monotonic() - t0)
        got = sorted((r["doc_id"], r["bm25"]) for r in rows)
        if want is None:
            want = got
        assert got == want, f"{name} diverges from map_only top-k"
        print(
            json.dumps(
                {"variant": name, "wall_min_s": round(min(walls), 3),
                 "walls_s": [round(w, 3) for w in walls]}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
