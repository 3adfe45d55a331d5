"""Readwise export ingestion: nested JSON → flat highlights rows.

Mirrors the reference's parser (``jobs/parser.py:19-36``) and export
client shape (``core/readwise.py:40-64``): each raw record carries a
nested ``book`` struct and ``tags`` as a list of ``{name: ...}`` structs.

Spark mapping of the per-row Python parse loop: one declarative
projection —

- ``book.{title,author,category,source_url}`` flattened (C6)
- ``book.id`` cast to string (``str(book.id)``, parser.py:28)
- ``url`` = coalesce(raw.url, book.source_url) (readwise.py:60-63)
- tag-name extraction tolerating structs without a name (C5, parser.py:32)
- ISO-8601 timestamps with trailing Z parsed, garbage → NULL (C4,
  parser.py:7-16) — ``try_to_timestamp`` is the vectorized analogue of
  the reference's try/except.

At scale this runs as ``spark.read.json(..., schema=EXPORT_SCHEMA)``
over raw API page dumps — schema-on-read, no inference pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXPORT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("note", T.StringType()),
        T.StructField("location", T.LongType()),
        T.StructField("highlighted_at", T.StringType()),
        T.StructField("updated_at", T.StringType()),
        T.StructField(
            "tags",
            T.ArrayType(T.StructType([T.StructField("name", T.StringType())])),
        ),
        T.StructField(
            "book",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("title", T.StringType()),
                    T.StructField("author", T.StringType()),
                    T.StructField("category", T.StringType()),
                    T.StructField("source", T.StringType()),
                    T.StructField("source_url", T.StringType()),
                ]
            ),
        ),
    ]
)


def read_export_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(EXPORT_SCHEMA).json(path)


def parse_export(raw: DataFrame) -> DataFrame:
    """Flatten one export page into highlight rows (reference parser.py:19-36)."""
    return raw.select(
        F.col("id").cast("string").alias("id"),
        F.col("text"),
        F.col("book.category").alias("source_type"),
        F.col("book.id").cast("string").alias("source_id"),
        F.col("book.author").alias("source_author"),
        F.col("book.title").alias("source_title"),
        F.coalesce(F.col("url"), F.col("book.source_url")).alias("source_url"),
        F.col("note"),
        F.col("location"),
        F.try_to_timestamp(F.col("highlighted_at")).alias("highlighted_at"),
        F.try_to_timestamp(F.col("updated_at")).alias("updated_at"),
        F.filter(
            F.transform(F.col("tags"), lambda t: t["name"]),
            lambda name: name.isNotNull(),
        ).alias("tags"),
    )


def embed_input(df: DataFrame) -> DataFrame:
    """text + optional note → the string the embedder sees
    (reference jobs/incremental.py:58: f"{text} {note or ''}")."""
    return df.withColumn("embed_text", F.concat_ws(" ", "text", "note"))
