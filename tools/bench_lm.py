"""Measure lm_score_docs' map-only pass vs the naive explode pipeline.

Usage: python tools/bench_lm.py [corpus_dir] [reps]

The operator scores each document inside its own row (broadcast LM dict,
one Arrow pass); the textbook plan explodes every bigram, joins the LM
tables, and re-aggregates per doc — a token-level shuffle.  Identical
output asserted per rep (same rounding pipeline on both paths).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def naive_lm_score(spark, docs, uni, bi, v, add_k=0.5):
    """Explode bigrams → broadcast-join LM rows → groupBy(doc) — the
    token-shuffle plan lm_score_docs avoids."""
    from readwise_vector_db_spark.functions.text import ws_tokens

    uni_df = F.broadcast(
        spark.createDataFrame(
            [(w, c) for w, c in uni.items()], "w1 string, c1 long"
        )
    )
    bi_df = F.broadcast(
        spark.createDataFrame(
            [(a, b, c) for (a, b), c in bi.items()], "w1 string, w2 string, c12 long"
        )
    )
    toks = docs.select(
        F.col("doc_id"), ws_tokens(F.lower(F.col("text"))).alias("t")
    ).filter(F.col("t").isNotNull())
    pairs = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.size("t") - 1),
                F.slice("t", 2, F.size("t") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    lp = F.round(
        F.log(
            (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(add_k))
            / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(add_k * v))
        ),
        9,
    ).cast("decimal(28,9)")
    scored = (
        pairs.join(bi_df, ["w1", "w2"], "left")
        .join(uni_df.withColumnRenamed("w1", "w1_u").withColumnRenamed("c1", "c1_u")
              .select(F.col("w1_u").alias("w1"), F.col("c1_u").alias("c1")), "w1", "left")
        .withColumn("_lp", lp)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            (F.sum("_lp").cast("double") / F.count("*")).alias("raw"),
        )
    )
    avg = F.round(F.col("raw"), 6)
    return scored.select(
        "doc_id", "n_bigrams", avg.alias("avg_logp"),
        F.round(F.exp(-avg), 6).alias("ppl"),
    )


def main() -> None:
    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from readwise_vector_db_spark.operators import lm
    from readwise_vector_db_spark.session import get_spark

    spark = get_spark("bench_lm")
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n = docs.count()
    uni, bi, v = lm.train_bigram_lm(docs.filter(F.col("lang") == "en"))
    print(
        f"# corpus {corpus_dir}: n_docs={n} vocab={v} bigrams={len(bi)}",
        flush=True,
    )

    variants = {
        "map_only": lambda: lm.lm_score_docs(docs, uni, bi, v).collect(),
        "explode_join_shuffle": lambda: naive_lm_score(
            spark, docs, uni, bi, v
        ).collect(),
    }
    want = None
    for name, fn in variants.items():
        walls = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            rows = fn()
            walls.append(time.monotonic() - t0)
        got = sorted(
            (r["doc_id"], r["n_bigrams"], r["avg_logp"], r["ppl"]) for r in rows
        )
        if want is None:
            want = got
        assert got == want, f"{name} diverges from map_only"
        print(
            json.dumps(
                {"variant": name, "wall_min_s": round(min(walls), 3),
                 "walls_s": [round(w, 3) for w in walls]}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
