"""Train the deterministic quality-classifier artifact (round 11).

Fits the planted split (operators/quality_model.planted_training_corpora
— first 200 fixture docs vs 200 deterministic junk docs) with
``deterministic=True`` and exports the term-weight artifact the
``quality_model_scores`` oracle entry reads.  Re-running reproduces
the committed artifact bit-for-bit (pinned by
tests/test_quality_model.py::test_deterministic_fit_reproduces_artifact).

Usage: python tools/train_quality_artifact.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
DEFAULT_SF = "/root/testdata/sf0.01"
DEFAULT_OUT = os.path.join(ROOT, "tests", "fixtures", "quality_lr_sf001")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF
    out_dir = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    from pyspark.sql import SparkSession

    from readwise_vector_db_spark.operators.quality_model import (
        export_term_weight_artifact,
        planted_training_corpora,
        train_quality_model,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    good, bad = planted_training_corpora(spark, sf_dir)
    model = train_quality_model(good, bad, deterministic=True)
    # vocabulary = the full scoring corpus ∪ the junk vocabulary, so the
    # oracle's scoring never meets an uncovered token
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    vocab = docs.select("text").unionByName(bad.select("text"))
    rec = export_term_weight_artifact(model, vocab, out_dir)
    print(f"artifact written to {out_dir}: {rec}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
