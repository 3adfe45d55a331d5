"""Per-batch regime of the STREAMING span-dedup face (round 9).

The r8 study measured `span_dedup_batch_against_store` through direct
batch calls; this harness drives the actual `run_incremental_span_dedup`
streaming face — marker pinning, per-batch overwrite output partitions,
store append — over N single-file micro-batches of sf0.1 documents
(each batch re-labels the same docs with fresh ids, so cross-batch
span repeats are plentiful: the store-probe path does real work every
batch).  Reports wall per batch (measured inside the foreachBatch
processor), store fingerprint growth, and cleaned-output rows; then
REPLAYS the last batch through the batch API with its pinned marker
version to verify the retry contract end-to-end (identical cleaned
hash, zero fingerprints appended).

Round 11 adds the SIGNALS regime: pass a third arg ``signals`` and the
same stream also scores every batch's fused quality-signal row, runs
the drift gate against the accumulated reference window, and commits
to the versioned signals table — the per-batch signal wall is reported
separately so the O(1)-per-batch claim (no corpus rescan, no growth
with store size) is measured, not asserted.

Usage: python tools/bench_span_stream.py [n_batches] [rows_per_batch] [signals]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF01 = "/root/testdata/sf0.1"


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    with_signals = len(sys.argv) > 3 and sys.argv[3] == "signals"

    from readwise_vector_db_spark.jobs import incremental_dedup as inc
    from readwise_vector_db_spark.session import get_spark
    from readwise_vector_db_spark.sources.versioned import VersionedTable

    spark = get_spark("span_stream_bench")
    base = spark.read.parquet(f"{SF01}/documents.parquet").select(
        "doc_id", "text"
    ).limit(rows_per).persist()
    base.count()

    root = "/tmp/span_stream_bench"
    shutil.rmtree(root, ignore_errors=True)
    src, store, out = f"{root}/in", f"{root}/store", f"{root}/out"
    for i in range(n_batches):
        base.select(
            (F.col("doc_id") + i * 1_000_000).alias("doc_id"), "text"
        ).coalesce(1).write.mode("append").parquet(src)

    walls: list[float] = []
    sig_walls: list[float] = []
    real_process = inc.span_dedup_batch_against_store
    real_signals = inc.commit_batch_signals

    def timed(*a, **k):
        t0 = time.monotonic()
        res = real_process(*a, **k)
        res[0].count()  # materialize inside the timing window
        walls.append(round(time.monotonic() - t0, 2))
        return res

    def timed_signals(*a, **k):
        t0 = time.monotonic()
        res = real_signals(*a, **k)
        sig_walls.append(round(time.monotonic() - t0, 2))
        return res

    stream_kwargs: dict = {}
    if with_signals:
        from readwise_vector_db_spark.operators.lm import train_bigram_lm

        lm = train_bigram_lm(base, min_count=2)
        stream_kwargs = {
            "signals_lm": lm,
            "signals_gate": {"min_ref": 2, "on_drift": "quarantine"},
            "signals_retention": 64,
        }

    inc.span_dedup_batch_against_store = timed
    inc.commit_batch_signals = timed_signals
    try:
        stream = (
            spark.readStream.schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = inc.run_incremental_span_dedup(
            spark, stream, store, out, **stream_kwargs
        )
        drained = q.awaitTermination(1200)
        if not drained:
            q.stop()
            raise RuntimeError(
                "stream did not drain in 1200s — partial results, refusing "
                "to emit a regime measurement"
            )
    finally:
        inc.span_dedup_batch_against_store = real_process
        inc.commit_batch_signals = real_signals

    table = VersionedTable(store)
    fps = table.read(spark).count()
    cleaned = spark.read.parquet(out)
    emit = {
        "mode": "span_stream",
        "n_batches": n_batches,
        "rows_per_batch": rows_per,
        "per_batch_wall_s": walls,
        "store_fingerprints": fps,
        "cleaned_rows": cleaned.count(),
        "cleaned_batches": cleaned.select("batch").distinct().count(),
    }

    if with_signals:
        emit["per_batch_signal_wall_s"] = sig_walls
        sig_table = VersionedTable(f"{out}_signals")
        emit["signal_versions"] = sig_table.latest_version()
        emit["quarantined_batches"] = sum(
            1 for _, m in sig_table.commit_metas() if m.get("quarantined")
        )

    # retry contract end-to-end: replay the LAST batch with its pinned
    # marker version — identical cleaned hash, zero appends.  The pin
    # lives UNDER the stream checkpoint since r10 (deleting the
    # checkpoint must delete the pins).
    last = n_batches - 1
    with open(f"{store}/_stream_checkpoint/_batch_base/{last}") as f:
        pinned = int(f.read().strip())
    batch_df = spark.read.parquet(src).filter(
        (F.col("doc_id") >= last * 1_000_000)
        & (F.col("doc_id") < (last + 1) * 1_000_000)
    )
    replay, stats = real_process(spark, batch_df, table, read_version=pinned)

    def h(df):
        return df.agg(
            F.sum(
                F.xxhash64("doc_id", "clean_text").cast("decimal(38,0)")
            ).alias("h")
        ).first()["h"]

    stream_last = cleaned.filter(F.col("batch") == last).select(
        "doc_id", "clean_text"
    )
    emit["replay_hash_equal"] = bool(h(replay) == h(stream_last))
    emit["replay_fps_appended"] = stats["fps_appended"]
    print(json.dumps(emit), flush=True)
    base.unpersist()


if __name__ == "__main__":
    main()
