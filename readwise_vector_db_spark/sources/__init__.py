from readwise_vector_db_spark.sources.tables import load_table, highlights  # noqa: F401
