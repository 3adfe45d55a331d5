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

Usage: python tools/bench_skew.py [semantic|pack|all]
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


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("semantic", "all"):
        bench_semantic()
    if which in ("pack", "all"):
        bench_pack()


if __name__ == "__main__":
    main()
