"""readwise_vector_db_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference system ``leonardsellem/readwise-vector-db``
(a Postgres+pgvector semantic-search service), extended with the
large-scale training-data pipeline operators (dedup, similarity join,
text analysis) that a 100 TB corpus requires.

Design principles (see SURVEY.md):

- DataFrame/SQL first: every operator is declared with the DataFrame API
  so Catalyst handles pushdown, pruning, join selection, and codegen.
- UDFs only where built-ins can't express the semantics, and then always
  Arrow-batched pandas UDFs, never row-at-a-time Python.
- Top-k is ``orderBy().limit()`` → ``TakeOrderedAndProject`` (per-partition
  heaps + driver merge; no global sort shuffle).
- Vector math stays JVM-side via higher-order functions
  (``zip_with``/``aggregate``) over ``array<double>`` columns.
"""

__version__ = "0.1.0"
