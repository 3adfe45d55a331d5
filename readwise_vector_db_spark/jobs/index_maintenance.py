"""Streaming maintenance of the IVF-PQ serving index.

The reference's index stays fresh because Postgres INSERTs update
pgvector's HNSW in-place; here freshness is a layout property — every
micro-batch of new embeddings is encoded against the FROZEN coarse
centroids + PQ codebooks and appended into the cluster partition
directories (``operators/pq.append_to_ivfpq_index``, O(increment),
existing files untouched).  Probes started after a batch commits see
its rows immediately; no rebuild, no lock, readers never block.

This is the ANN twin of ``jobs/incremental_dedup.py``'s store appends:
``foreachBatch`` turns the stream into a sequence of batch appends with
exactly-once bookkeeping from the stream checkpoint.  Model staleness
on drifted data is the price (documented on the append op); the
retrain-and-swap is an offline rebuild into a fresh artifact path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def run_streaming_index_append(
    spark: SparkSession,
    stream_vecs: DataFrame,
    index_path: str,
    checkpoint: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Wire ``append_to_ivfpq_index`` under ``foreachBatch``; trigger
    ``availableNow`` so a bounded source drains and stops (incremental
    batch semantics from a streaming plan — the jobs/sync.py pattern).
    Returns the started StreamingQuery."""
    from readwise_vector_db_spark.operators.pq import append_to_ivfpq_index

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        append_to_ivfpq_index(batch_df, index_path, id_col=id_col, vec_col=vec_col)

    return (
        stream_vecs.writeStream.foreachBatch(process)
        .option(
            "checkpointLocation", checkpoint or f"{index_path}/_stream_checkpoint"
        )
        .trigger(availableNow=True)
        .start()
    )
