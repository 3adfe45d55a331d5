"""Multimodal suite: binary media columns + typed metadata, processed with
Arrow-batched ``mapInPandas`` (north-star scope, SURVEY §2.7).

The media table is derived deterministically from ``documents``
(operators/multimodal.py:media_from_documents), so everything EXCEPT the
stubbed codec output is oracle-checkable: payload integrity via md5,
batch shape via n_bytes/feat_dim, and the video frame-sampling fan-out
via generate_series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readwise_vector_db_spark.operators import multimodal as mm
from readwise_vector_db_spark.registry import register
from readwise_vector_db_spark.sources.tables import load_table

_KIND_CASE = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)


@register(
    "multimodal_features",
    f"""
    SELECT doc_id AS media_id,
           {_KIND_CASE} AS kind,
           octet_length(encode(text)) AS n_bytes,
           16 AS feat_dim,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media → mapInPandas feature extraction; the oracle checks the
    Spark-side plumbing (payload bytes survive intact, every row yields a
    FEATURE_DIM vector) while the codec itself stays a deterministic fake.
    """
    media = mm.media_from_documents(load_table(spark, sf_dir, "documents", parallelize=True))
    feats = mm.extract_features(media)
    checks = media.select("media_id", F.md5("payload").alias("payload_md5"))
    # 1:1 equi-join on the unique media id; at scale both sides share the
    # documents partitioning, and AQE picks broadcast when checks is small
    return (
        feats.join(checks, "media_id")
        .select(
            "media_id",
            "kind",
            F.col("n_bytes").cast("int").alias("n_bytes"),
            F.size("features").alias("feat_dim"),
            "payload_md5",
        )
    )


@register(
    "multimodal_frames",
    """
    SELECT doc_id AS media_id,
           unnest(generate_series(0, greatest(n_chars * 40 - 1, 0), 1000)) AS frame_ms
    FROM documents
    WHERE doc_id % 3 = 2
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-offset explosion (decode stubbed): sequence + explode is
    pure column math, so the fan-out stage of a video pipeline runs fully
    JVM-side with no Python in the loop."""
    media = mm.media_from_documents(load_table(spark, sf_dir, "documents", parallelize=True))
    return mm.sample_frames(media, every_ms=1000)
