"""Skew-stress the applyInPandas stages (round-6 verdict item 6).

Both groupBy().applyInPandas operators materialize ONE GROUP per task
in the Python worker, so a hot group is a worker-memory exposure, not a
JVM one — Spark's AQE skew handling never sees it.  This harness plants
the hot group and MEASURES the exposure end-to-end:

  semantic:  a corpus where 50 % of vectors form one quantizer cell
             (co-clustered, but NOT near-dups — the memory regime, not
             the output-explosion regime), pushed through the REAL
             ``semantic_dedup_pairs`` BLAS path twice: unsplit
             (max_cell_rows=inf — the r6 behavior) vs split
             (max_cell_rows=cap — the r7 mitigation).  Reports wall and
             the peak RSS of the hottest Python worker process, sampled
             from /proc every 50 ms during the stage.
  pack:      ``pack_greedy`` where ids are crafted so ~half the corpus
             hashes into one shard, vs a uniform id set of the same
             size.  The per-task payload is (id, n_tokens) ONLY (the
             operator never ships text), so the expected result is a
             wall skew bounded by one shard's O(n log n) greedy scan
             and a worker RSS in the tens of MB — the documented bound,
             verified rather than argued.

Worker RSS methodology: every live process whose cmdline contains
``pyspark.daemon`` is sampled every 50 ms; the metric is the MAX
single-process VmRSS observed during the measured action — the hot
task's worker dominates it by construction.  Peaks are absolute (a
fresh-forked worker baseline is a few tens of MB, far below the
signal).  One JSON line per configuration.

  spans:     the round-9 hot-window fixture — ONE 8-token boilerplate
             window repeated 10⁵× across 20 k documents, measuring the
             exchange task balance of the old span-cut shuffle key (the
             n-gram itself → every occurrence in one task) vs the new
             composite (ngram, id, pos) key, plus end-to-end wall of
             both cut formulations with a full clean-text hash equality
             check.

  split:     a HOT STRATUM (half the corpus one source) through the
             stratified split's rank — old stratum-only key vs the
             round-9 two-phase (stratum, hash-sub-bucket) key, plus
             end-to-end wall and exact per-split counts.

Usage: python tools/bench_skew.py [semantic|pack|spans|split|all]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


class WorkerRssSampler:
    """Max single-pyspark-worker RSS (MB), sampled from /proc."""

    def __init__(self, interval: float = 0.05):
        self.interval = interval
        self.peak_mb = 0.0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _pids(self) -> list[int]:
        out = []
        for name in os.listdir("/proc"):
            if not name.isdigit():
                continue
            try:
                with open(f"/proc/{name}/cmdline", "rb") as f:
                    cmd = f.read()
            except OSError:
                continue
            if b"pyspark.daemon" in cmd or b"pyspark.worker" in cmd:
                out.append(int(name))
        return out

    def _rss_mb(self, pid: int) -> float:
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        return int(line.split()[1]) / 1024.0
        except OSError:
            pass
        return 0.0

    def _run(self) -> None:
        while not self._stop.is_set():
            for pid in self._pids():
                rss = self._rss_mb(pid)
                if rss > self.peak_mb:
                    self.peak_mb = rss
            time.sleep(self.interval)

    def __enter__(self) -> "WorkerRssSampler":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._thread.join(timeout=2)


def emit(**kv) -> None:
    print(json.dumps(kv), flush=True)


def bench_semantic(n: int = 16_000, d: int = 512, cap: int = 1_024) -> None:
    from readwise_vector_db_spark.operators.dedup import semantic_dedup_pairs
    from readwise_vector_db_spark.session import get_spark

    spark = get_spark("skew_semantic")
    rng = np.random.default_rng(23)
    hub = rng.standard_normal(d).astype(np.float32)
    rows = []
    # hot half: same cell (nearest the hub), but sigma large enough that
    # almost no pair clears 0.999 — the memory-stress regime
    half = n // 2
    for i in range(half):
        v = hub + 0.35 * rng.standard_normal(d).astype(np.float32)
        rows.append((i, [float(x) for x in v]))
    for i in range(half, n):
        rows.append((i, [float(x) for x in rng.standard_normal(d)]))
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(32).persist()
    embs.count()
    # fixed quantizer: the hub plus spread centroids → the hot half
    # provably co-assigns to cell 0
    quant = [(0, [float(x) for x in hub])] + [
        (j, [float(x) for x in rng.standard_normal(d) * 2.0])
        for j in range(1, 16)
    ]

    for label, mcr in (("unsplit", 1 << 30), ("split", cap)):
        with WorkerRssSampler() as samp:
            t0 = time.monotonic()
            n_pairs = semantic_dedup_pairs(
                embs, threshold=0.999, quantizer=quant, max_cell_rows=mcr
            ).count()
            wall = time.monotonic() - t0
        emit(
            mode="semantic", config=label, n=n, d=d, hot_rows=half,
            max_cell_rows=mcr if mcr != (1 << 30) else None,
            pairs=n_pairs, wall_s=round(wall, 2),
            peak_worker_rss_mb=round(samp.peak_mb, 1),
        )
    embs.unpersist()


def bench_pack(n: int = 2_000_000, n_shards: int = 8) -> None:
    from readwise_vector_db_spark.operators.dedup import hash64
    from readwise_vector_db_spark.operators.sampling import pack_greedy
    from readwise_vector_db_spark.session import get_spark

    spark = get_spark("skew_pack")
    # uniform control: ids 0..n-1 (xxhash64 spreads them evenly)
    uniform = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(890)) + 10).alias("n_tokens"),
    )
    # planted skew: pick HALF the ids from the subset hashing to shard 0
    # (50 % hot shard), half uniform — crafted ids, same row count
    pool = spark.range(8 * n).select(F.col("id").alias("doc_id"))
    shard = F.pmod(
        hash64(F.col("doc_id").cast("string"), "xxhash64"), F.lit(n_shards)
    )
    hot_ids = pool.filter(shard == 0).limit(n // 2)
    cold_ids = pool.filter(shard != 0).limit(n - n // 2)
    skewed = hot_ids.unionByName(cold_ids).select(
        "doc_id",
        (F.pmod(F.xxhash64(F.col("doc_id")), F.lit(890)) + 10).alias("n_tokens"),
    ).repartition(32).persist()
    skewed.count()
    uniform = uniform.repartition(32).persist()
    uniform.count()

    for label, df in (("uniform", uniform), ("hot_shard_50pct", skewed)):
        with WorkerRssSampler() as samp:
            t0 = time.monotonic()
            packed = pack_greedy(df, capacity=1024, n_shards=n_shards)
            rows = packed.count()
            wall = time.monotonic() - t0
        per_shard = (
            pack_greedy(df, capacity=1024, n_shards=n_shards)
            .groupBy("shard").count().collect()
        )
        sizes = sorted(int(r["count"]) for r in per_shard)
        emit(
            mode="pack", config=label, n=n, n_shards=n_shards, rows=rows,
            wall_s=round(wall, 2),
            peak_worker_rss_mb=round(samp.peak_mb, 1),
            shard_rows_min=sizes[0], shard_rows_max=sizes[-1],
        )
    skewed.unpersist()
    uniform.unpersist()


def bench_spans(n_docs: int = 20_000, copies_per_doc: int = 5) -> None:
    """Round-9 fixture: ONE 8-token boilerplate window planted
    n_docs×copies_per_doc times (10⁵ at the defaults) across otherwise
    unique documents — the shape where the r8 cut rule
    (``row_number() over (partitionBy(ngram))``) serialized every
    occurrence into a single task's sort.

    Measures, on the REAL detection output:

    - task balance of the exchange each formulation induces, by hash-
      repartitioning the span frame on each formulation's shuffle key
      (old: ``ngram`` — the hot content itself; new: the composite
      ``(ngram, id, pos)``) and counting rows per partition — the
      max/mean ratio IS the task-balance number for that exchange;
    - end-to-end wall of the old rank-window cut vs the new
      min(struct)+anti-join cut, both producing identical clean text
      (asserted by full-frame hash comparison).
    """
    from pyspark.sql import Window as W

    from readwise_vector_db_spark.operators.dedup import (
        drop_repeated_spans,
        repeated_ngram_spans,
    )
    from readwise_vector_db_spark.session import get_spark

    spark = get_spark("skew_spans")
    boiler = "all rights reserved contact the site administrator now"  # 8 toks
    # each doc: copies_per_doc boiler copies separated by 8 unique
    # filler tokens (u<j>x<doc_id>) so only the boiler window repeats
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat_ws(
                    " ",
                    F.lit(boiler),
                    *[
                        F.concat(F.lit(f"u{j}x"), F.col("id").cast("string"))
                        for j in range(8 * c, 8 * c + 8)
                    ],
                )
                for c in range(copies_per_doc)
            ],
        ).alias("text"),
    ).repartition(32).persist()
    docs.count()
    hot_occurrences = n_docs * copies_per_doc

    spans = repeated_ngram_spans(docs, n=8).persist()
    spans.count()

    # exchange task balance: rows per hash partition under each key
    for label, keys in (
        ("old_key_ngram", [F.col("ngram")]),
        ("new_key_composite", [F.col("ngram"), F.col("doc_id"), F.col("pos")]),
    ):
        dist = (
            spans.repartition(32, *keys)
            .withColumn("_p", F.spark_partition_id())
            .groupBy("_p")
            .count()
            .collect()
        )
        sizes = sorted(int(r["count"]) for r in dist)
        total = sum(sizes)
        mean_all = total / 32  # mean over ALL exchange partitions
        emit(
            mode="spans", config=label, n_docs=n_docs,
            hot_occurrences=hot_occurrences, span_rows=total,
            partitions_nonempty=len(sizes),
            task_rows_max=sizes[-1],
            task_rows_mean=round(mean_all, 1),
            balance_max_over_mean=round(sizes[-1] / mean_all, 2),
        )

    # end-to-end wall: old rank-window cut (reconstructed) vs shipped cut
    def old_cut():
        w = W.partitionBy("ngram").orderBy(F.col("doc_id"), F.col("pos"))
        cut = (
            spans.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > 1)
        )
        return cut.select("doc_id", "pos")

    from readwise_vector_db_spark.functions.text import ws_tokens

    def rebuild(cut):
        cov = (
            cut.select(
                F.col("doc_id").alias("id"),
                F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(7))).alias("i"),
            )
            .groupBy("id").agg(F.collect_set("i").alias("_cov"))
        )
        base = docs.select(F.col("doc_id").alias("id"), ws_tokens("text").alias("toks"))
        j = base.join(cov, "id", "left").withColumn(
            "_cov", F.coalesce(F.col("_cov"), F.array().cast("array<int>"))
        )
        kept = F.array_sort(
            F.array_except(F.sequence(F.lit(0), F.size("toks") - F.lit(1)), F.col("_cov"))
        )
        return j.select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ", F.transform(kept, lambda i: F.element_at("toks", i + F.lit(1)))
            ).alias("clean_text"),
        )

    t0 = time.monotonic()
    old_hash = rebuild(old_cut()).agg(
        F.sum(F.xxhash64("doc_id", "clean_text").cast("decimal(38,0)")).alias("h")
    ).first()["h"]
    wall_old = time.monotonic() - t0
    t0 = time.monotonic()
    new_frame = drop_repeated_spans(docs, n=8)
    new_hash = new_frame.agg(
        F.sum(F.xxhash64("doc_id", "clean_text").cast("decimal(38,0)")).alias("h")
    ).first()["h"]
    wall_new = time.monotonic() - t0
    emit(
        mode="spans", config="cut_wall", n_docs=n_docs,
        hot_occurrences=hot_occurrences,
        wall_old_rank_window_s=round(wall_old, 2),
        wall_new_min_antijoin_s=round(wall_new, 2),
        clean_text_hash_equal=bool(old_hash == new_hash),
    )
    spans.unpersist()
    docs.unpersist()


def bench_split(n: int = 2_000_000, hot_frac: float = 0.5) -> None:
    """Round-9: the stratified-split rank under a HOT STRATUM (half the
    corpus from one source).  Measures the exchange task balance of the
    old rank key (the stratum alone — every hot-stratum row in one
    task's sort) vs the two-phase key (stratum, contiguous-hash
    sub-bucket), plus end-to-end wall and exact per-split counts of the
    shipped implementation."""
    import inspect

    from readwise_vector_db_spark.operators.sampling import (
        _RATE_DEN,
        _bucket,
        _two_phase_group_rank,
        dataset_split_stratified,
    )
    from readwise_vector_db_spark.session import get_spark

    # derive the sub-bucket count from the SHIPPED helper so the
    # measured key never diverges from what the operators execute
    n_sub = inspect.signature(_two_phase_group_rank).parameters[
        "n_subbuckets"
    ].default
    spark = get_spark("skew_split")
    hot_n = int(n * hot_frac)
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < hot_n, F.lit("hot-source")).otherwise(
            F.concat(F.lit("src-"), (F.col("id") % 64).cast("string"))
        ).alias("source"),
    ).repartition(32).persist()
    docs.count()
    width = _RATE_DEN // n_sub
    b = _bucket("doc_id", "split", "xxhash64")
    keyed = docs.withColumn(
        "_sub", F.floor(b / F.lit(width)).cast("int")
    )
    for label, keys in (
        ("old_key_stratum", [F.col("source")]),
        ("new_key_stratum_sub", [F.col("source"), F.col("_sub")]),
    ):
        dist = (
            keyed.repartition(32, *keys)
            .withColumn("_p", F.spark_partition_id())
            .groupBy("_p").count().collect()
        )
        sizes = sorted(int(r["count"]) for r in dist)
        total = sum(sizes)
        emit(
            mode="split", config=label, n=n, hot_rows=hot_n,
            task_rows_max=sizes[-1],
            balance_max_over_mean=round(sizes[-1] / (total / 32), 2),
        )
    t0 = time.monotonic()
    out = dataset_split_stratified(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, "source"
    )
    counts = {
        (bool(r["is_hot"]), r["split"]): int(r["c"])
        for r in out.groupBy(
            (F.col("source") == "hot-source").alias("is_hot"), "split"
        ).agg(F.count(F.lit(1)).alias("c")).collect()
    }
    wall = time.monotonic() - t0
    emit(
        mode="split", config="end_to_end", n=n, wall_s=round(wall, 2),
        hot_train=counts.get((True, "train")),
        hot_val=counts.get((True, "val")),
        hot_test=counts.get((True, "test")),
    )
    docs.unpersist()


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("semantic", "all"):
        bench_semantic()
    if which in ("pack", "all"):
        bench_pack()
    if which in ("spans", "all"):
        bench_spans()
    if which in ("split", "all"):
        bench_split()


if __name__ == "__main__":
    main()
