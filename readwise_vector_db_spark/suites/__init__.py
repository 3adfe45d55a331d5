"""Import every suite module so its ``@register`` calls populate the registry."""

from readwise_vector_db_spark.suites import (  # noqa: F401
    curation,
    dedup,
    ingest,
    multimodal,
    relational,
    sampling,
    similarity,
    text_analysis,
    vector_search,
)
