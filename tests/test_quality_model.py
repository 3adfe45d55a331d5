"""Model-based quality classifier: separation on planted labels,
map-only scoring (operators/quality_model.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from readwise_vector_db_spark.operators.quality_model import (
    score_quality,
    train_quality_model,
)
from tests.conftest import SF_CORRECT, SF_SMOKE


def _corpora(spark):
    """Good = fixture documents (natural word soup); bad = synthetic
    junk drawn hash-deterministically from a SHARED 50-token junk
    vocabulary disjoint from the fixture's — each class has a stable
    token distribution (what the classifier actually learns), while
    every individual document is distinct."""
    good = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(200)
    junk = F.array(*[F.lit(f"qjunk{k}") for k in range(50)])
    bad = spark.range(200).select(
        (F.col("id") + 10_000).alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(29)),
                lambda j: junk[
                    F.pmod(F.xxhash64(F.col("id"), j), F.lit(50)).cast("int")
                ],
            ),
            " ",
        ).alias("text"),
    )
    return good, bad


def test_quality_model_separates_planted_labels(spark):
    good, bad = _corpora(spark)
    model = train_quality_model(good, bad)
    g = score_quality(model, good).agg(F.avg("quality_prob")).collect()[0][0]
    b = score_quality(model, bad).agg(F.avg("quality_prob")).collect()[0][0]
    assert g > 0.9, g
    assert b < 0.1, b


def test_quality_model_generalizes_to_held_out_docs(spark):
    """Train on one half of each corpus, score the other: the hashed
    linear model must still separate unseen docs — it learned the token
    distribution, not the ids."""
    good, bad = _corpora(spark)
    model = train_quality_model(
        good.filter(F.col("doc_id") % 2 == 0), bad.filter(F.col("doc_id") % 2 == 0)
    )
    g = (
        score_quality(model, good.filter(F.col("doc_id") % 2 == 1))
        .agg(F.avg("quality_prob"))
        .collect()[0][0]
    )
    b = (
        score_quality(model, bad.filter(F.col("doc_id") % 2 == 1))
        .agg(F.avg("quality_prob"))
        .collect()[0][0]
    )
    assert g > 0.8, g
    assert b < 0.2, b


def test_score_quality_schema_and_bounds(spark):
    good, bad = _corpora(spark)
    model = train_quality_model(good.limit(50), bad.limit(50))
    out = score_quality(model, good.limit(20))
    assert out.columns == ["doc_id", "quality_prob"]
    rows = out.collect()
    assert len(rows) == 20
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in rows)


def test_deterministic_fit_reproduces_committed_artifact(spark, tmp_path):
    """r11 (verdict item 6): deterministic=True — single-partition,
    sorted-input L-BFGS — reproduces the COMMITTED artifact bit-for-bit
    (term weights and intercept both in integer nano-units), which is
    what entitles the quality_model_scores oracle entry to exist."""
    import json
    import os

    from readwise_vector_db_spark.operators.quality_model import (
        export_term_weight_artifact,
        planted_training_corpora,
    )

    committed = os.path.join(
        os.path.dirname(__file__), "fixtures", "quality_lr_sf001"
    )
    good, bad = planted_training_corpora(spark, SF_CORRECT)
    model = train_quality_model(good, bad, deterministic=True)
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    out = str(tmp_path / "retrained")
    export_term_weight_artifact(
        model, docs.select("text").unionByName(bad.select("text")), out
    )

    def read_artifact(d):
        with open(os.path.join(d, "model.json")) as f:
            rec = json.load(f)
        rows = sorted(
            (r["term"], r["w_nano"])
            for r in spark.read.parquet(os.path.join(d, "terms.parquet")).collect()
        )
        return rec["intercept_nano"], rows

    assert read_artifact(out) == read_artifact(committed)


def test_artifact_scoring_matches_model_transform(spark, tmp_path):
    """The flattened artifact is a faithful serving form: broadcast-join
    + exact nano-sum scoring equals the fitted model's own transform
    (at the 6 dp grain every score is published at) on a corpus the
    artifact's vocabulary covers."""
    import os

    from readwise_vector_db_spark.operators.quality_model import (
        planted_training_corpora,
        score_from_artifact,
    )

    committed = os.path.join(
        os.path.dirname(__file__), "fixtures", "quality_lr_sf001"
    )
    good, bad = planted_training_corpora(spark, SF_CORRECT)
    model = train_quality_model(good, bad, deterministic=True)
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    want = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(model, docs).collect()
    }
    got = {
        r["doc_id"]: r["quality_prob"]
        for r in score_from_artifact(docs, committed).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-6, (k, got[k], want[k])
