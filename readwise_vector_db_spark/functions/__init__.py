from readwise_vector_db_spark.functions.vector import (  # noqa: F401
    cosine_distance,
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
)
