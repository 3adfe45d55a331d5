"""Import every suite module so its ``@register`` calls populate the registry.

Import order IS registration order, and the driver's correctness gate
checks the first ``registry.DRIVER_QUERY_CAP`` registered queries — so the
flagship suites (vector search, similarity, text analysis) come first.
The cap itself is enforced at registration time (registry.py raises on
overflow), so ordering is belt-and-braces, not the safety mechanism.
"""

from readwise_vector_db_spark.suites import (  # noqa: F401
    vector_search,
    similarity,
    text_analysis,
    dedup,
    curation,
    sampling,
    multimodal,
    ingest,
    relational,
)
