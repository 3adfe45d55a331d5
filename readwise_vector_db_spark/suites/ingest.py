"""Ingest suite: MERGE-upsert and nested-export parsing, oracle-checked.

Both queries build their inputs *from the fixture tables themselves*
(identical CTE construction on both engines), so the driver's value-hash
exercises the operator logic end-to-end without external files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readwise_vector_db_spark.operators.upsert import merge_upsert
from readwise_vector_db_spark.registry import register
from readwise_vector_db_spark.sources.tables import load_table


@register(
    "upsert_merge",
    """
    WITH updates AS (
        SELECT doc_id, text || ' [UPDATED]' AS text FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 5000000 AS doc_id, text FROM documents WHERE doc_id < 5
    ),
    merged AS (
        SELECT doc_id, text FROM updates
        UNION ALL
        SELECT doc_id, text FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM updates)
    )
    SELECT doc_id, md5(text) AS fp FROM merged
    """,
)
def upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ON CONFLICT (id) DO UPDATE semantics (reference db/supabase_ops.py:
    112-208) as updates ∪ anti-join: 50 updated rows, 5 inserts, rest kept."""
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    updates = (
        base.filter(F.col("doc_id") % 10 == 0)
        .withColumn("text", F.concat(F.col("text"), F.lit(" [UPDATED]")))
        .unionByName(
            base.filter(F.col("doc_id") < 5).withColumn(
                "doc_id", F.col("doc_id") + 5000000
            )
        )
    )
    merged = merge_upsert(base, updates, "doc_id")
    return merged.select("doc_id", F.md5("text").alias("fp"))


@register(
    "parse_export",
    """
    WITH raw AS (
        SELECT doc_id AS id, text,
               CASE WHEN doc_id % 3 = 0 THEN NULL
                    ELSE 'http://u/' || doc_id END AS url,
               CASE WHEN doc_id % 4 = 0 THEN '2024-01-05T06:07:08Z'
                    WHEN doc_id % 4 = 1 THEN 'not-a-date'
                    WHEN doc_id % 4 = 2 THEN NULL
                    ELSE '2023-02-03T04:05:06Z' END AS highlighted_at,
               {'id': doc_id * 10, 'title': 'T' || doc_id, 'author': 'A' || (doc_id % 7),
                'category': source, 'source_url': 'http://b/' || doc_id} AS book,
               [{'name': lang}, {'name': NULL}, {'name': source}] AS tags
        FROM documents
    )
    SELECT CAST(id AS VARCHAR) AS id, text,
           book.category AS source_type,
           CAST(book.id AS VARCHAR) AS source_id,
           book.author AS source_author,
           book.title AS source_title,
           COALESCE(url, book.source_url) AS source_url,
           CAST(epoch(TRY_CAST(highlighted_at AS TIMESTAMP)) AS BIGINT) AS highlighted_epoch,
           -- COALESCE: a doc whose every tag name is NULL has an EMPTY
           -- tag list; its joined-string form is '' (Spark array_join)
           -- but DuckDB array_to_string([]) returns NULL — normalize to
           -- the list semantics (caught by the NULL-planted fixture)
           COALESCE(array_to_string(
               list_filter(list_transform(tags, t -> t.name), n -> n IS NOT NULL),
               ','), '') AS tags
    FROM raw
    """,
)
def parse_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4-C6 parser surface (reference jobs/parser.py:19-36): book-struct
    flatten, str(book.id) cast, url coalesce, tag-name extraction skipping
    nameless structs, ISO-8601-with-Z parse with garbage → NULL."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        F.col("doc_id").alias("id"),
        "text",
        F.when(F.col("doc_id") % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("http://u/"), F.col("doc_id")))
        .alias("url"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("2024-01-05T06:07:08Z"))
        .when(F.col("doc_id") % 4 == 1, F.lit("not-a-date"))
        .when(F.col("doc_id") % 4 == 2, F.lit(None).cast("string"))
        .otherwise(F.lit("2023-02-03T04:05:06Z"))
        .alias("highlighted_at"),
        F.struct(
            (F.col("doc_id") * 10).alias("id"),
            F.concat(F.lit("T"), F.col("doc_id")).alias("title"),
            F.concat(F.lit("A"), F.col("doc_id") % 7).alias("author"),
            F.col("source").alias("category"),
            F.concat(F.lit("http://b/"), F.col("doc_id")).alias("source_url"),
        ).alias("book"),
        F.array(
            F.struct(F.col("lang").alias("name")),
            F.struct(F.lit(None).cast("string").alias("name")),
            F.struct(F.col("source").alias("name")),
        ).alias("tags"),
    )
    return raw.select(
        F.col("id").cast("string").alias("id"),
        "text",
        F.col("book.category").alias("source_type"),
        F.col("book.id").cast("string").alias("source_id"),
        F.col("book.author").alias("source_author"),
        F.col("book.title").alias("source_title"),
        F.coalesce("url", F.col("book.source_url")).alias("source_url"),
        F.unix_timestamp(F.try_to_timestamp("highlighted_at")).alias("highlighted_epoch"),
        # joined string, not array: the driver canon cannot hash list cells
        F.array_join(
            F.filter(F.transform("tags", lambda t: t["name"]), lambda n: n.isNotNull()),
            ",",
        ).alias("tags"),
    )
