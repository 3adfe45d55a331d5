"""Incremental corpus dedup: new batches against the historical store.

The batch curation funnel (jobs/curate.py) dedups a corpus against
ITSELF; a production ingest is incremental — today's crawl must also be
deduped against everything already accepted.  Re-running the full-corpus
funnel per increment is O(corpus) per day; the incremental shape is
O(batch + matching-candidates):

1. in-batch exact dedup (min id per normalized text),
2. historical exact dedup: anti-join the batch's fingerprints against
   the store's fingerprint column (one narrow join — the store's TEXT
   is never read),
3. historical near-dup: band the batch's MinHash signatures and join
   them against the bands of the store's STORED signatures (signatures
   are computed once at accept time; banding a stored signature is a
   cheap projection).  The batch side is broadcast — the store scans
   but never shuffles.  Candidates verify by signature agreement ≥
   threshold; matches are dropped,
4. survivors append to a :class:`VersionedTable` carrying
   (id, fp, sig) — the store IS the index: each increment's signatures
   are computed once, at accept time, never recomputed.

At 100 TB the store-side near-dup join is a broadcast-probe scan of
the store (an increment's band table is small by construction); if
increments ever outgrow broadcast, the store layout's next step is
``bucketBy`` on the band key so both sides co-locate without a
store-side shuffle.  The
streaming face (``run_incremental_dedup``) runs the same batch
processor under ``foreachBatch``, exactly how jobs/sync.py wires
incremental ingest; snapshot isolation comes from the VersionedTable
pointer flip.

No reference counterpart (its only dedup is upsert-by-id,
``db/supabase_ops.py:112-208``) — north-star scope, SURVEY §2.7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readwise_vector_db_spark.functions.text import fingerprint_md5
from readwise_vector_db_spark.operators.dedup import (
    N_HASHES,
    band_keys,
    exact_dedup,
    minhash_signatures,
)
from readwise_vector_db_spark.sources.versioned import VersionedTable

STORE_SCHEMA = "doc_id LONG, fp STRING, sig ARRAY<BIGINT>"


def _with_fp_sig(
    docs: DataFrame, id_col: str, text_col: str, k: int, base_hash: str
) -> DataFrame:
    """(id_col, fp, sig) for every doc — the store row shape.  Docs too
    short to shingle carry a NULL sig (they can exact-match only)."""
    fps = docs.select(
        F.col(id_col), fingerprint_md5(text_col).alias("fp")
    )
    sigs = minhash_signatures(
        docs, k=k, id_col=id_col, text_col=text_col, base_hash=base_hash
    ).select(F.col("id").alias(id_col), "sig")
    return fps.join(sigs, id_col, "left")


def dedup_batch_against_store(
    spark: SparkSession,
    batch: DataFrame,
    table: VersionedTable,
    threshold: float = 0.6,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_hash: str = "xxhash64",
) -> dict[str, int]:
    """Process one increment: drop in-batch exact dups, historical exact
    dups, and historical near-dups (est-Jaccard ≥ ``threshold`` against
    any stored signature); append survivors' (id, fp, sig) to the store.
    Returns per-stage row accounting."""
    stats: dict[str, int] = {"batch_raw": batch.count()}

    deduped = exact_dedup(batch, id_col=id_col, text_col=text_col)
    rows = _with_fp_sig(deduped, id_col, text_col, k, base_hash).persist()
    stats["after_batch_exact"] = rows.count()

    if table.exists():
        store = table.read(spark)
        # historical exact: fingerprint anti-join — narrow columns only
        fresh = rows.join(store.select("fp"), "fp", "left_anti")
        # historical near-dup: band batch sigs vs store sigs, verify by
        # signature agreement (the unbiased Jaccard estimator — same
        # statistic minhash_lsh_pairs reports)
        nb = fresh.filter(F.col("sig").isNotNull()).select(
            F.col(id_col), F.col("sig").alias("sig_n"),
            F.explode(band_keys("sig")).alias("bh"),
        )
        sb = store.filter(F.col("sig").isNotNull()).select(
            F.col("sig").alias("sig_s"), F.explode(band_keys("sig")).alias("bh")
        )
        agree = F.size(
            F.filter(F.zip_with("sig_n", "sig_s", lambda x, y: x == y), lambda t: t)
        )
        # broadcast the BATCH bands: the store side — the ever-growing
        # one — is probed map-side and never shuffles
        near_ids = (
            sb.join(F.broadcast(nb), "bh")
            .filter((agree.cast("double") / F.lit(N_HASHES)) >= threshold)
            .select(id_col)
            .distinct()
        )
        survivors = fresh.join(near_ids, id_col, "left_anti")
    else:
        survivors = rows
    survivors = survivors.select(id_col, "fp", "sig").persist()
    stats["accepted"] = survivors.count()

    if stats["accepted"] > 0 or not table.exists():
        # append-only: the commit writes THIS increment's survivors and
        # publishes a segment-sharing snapshot — O(batch) I/O per
        # increment, never a store rewrite
        table.commit_append(survivors)
    stats["store_version"] = table.latest_version() or 0
    survivors.unpersist()
    rows.unpersist()
    return stats


def run_incremental_dedup(
    spark: SparkSession,
    stream_docs: DataFrame,
    store_root: str,
    threshold: float = 0.6,
    **kwargs,
):
    """Streaming face: wire the batch processor under ``foreachBatch``
    (the micro-batch pattern jobs/sync.py uses for ingest).  Each
    micro-batch dedups against the store as of its start — exactly the
    semantics a daily-increment pipeline has."""
    table = VersionedTable(store_root)

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        dedup_batch_against_store(
            spark, batch_df, table, threshold=threshold, **kwargs
        )

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", f"{store_root}/_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
