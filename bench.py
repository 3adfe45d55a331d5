"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints TWO JSON lines: first the FULL artifact (medians + minima +
serving/HTTP/curate-stage sections), then a compact headline line —
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {name: min_sec, ...}, "sf": 0.1,
   "stat": "min_over_2_runs", "n_runs": 2}
The compact line is LAST because the driver captures only the tail of
stdout and parses the final JSON line; round 5's single giant line
outgrew that window and the canonical artifact landed "parsed": null.

Each query runs through a full action — ``noop`` format write forces
complete execution of every partition without driver collection, so the
timing covers scan → shuffle → sink, not just the driver-side head.

Statistics (round 7): the WHOLE measurement sequence runs
``SPARK_GRAFT_BENCH_RUNS`` complete passes (default 2), each taking
``SPARK_GRAFT_BENCH_REPS`` reps per query (default 3), and the artifact
carries the CROSS-RUN fold — per-query min-of-medians in ``queries``,
min-of-mins in ``queries_min``, min per serving percentile, max per
throughput — plus ``n_runs``.  **Why**: this host shows multi-second
hypervisor-level stalls (round-4: 3→20 s outliers on identical warm
reps with zero guest-side pressure), and round 6 proved a SINGLE pass
is not trustworthy even with min-of-5 — BENCH_r06.json landed in one
bad window and read 8 phantom regressions that the same session's other
full runs showed flat.  A stall can only ADD time, so minima folded
across temporally-separated passes are the stall-robust statistic; the
median stays for cross-checking variance.

Stall localization (round 8 — r7 verdict item 2): each pass now runs in
its OWN PROCESS (fresh JVM, fresh heap) with a
``SPARK_GRAFT_BENCH_GAP_SEC`` (default 30 s) sleep between passes, so
one host window cannot span both passes through shared process state,
and the full artifact carries ``per_run_queries`` /
``per_run_queries_min`` (every pass's complete per-query dict) plus
``per_run_window`` (epoch start/end of each pass) — an elevated row is
now attributable to a specific pass and wall-clock window instead of
being unexplainable.

Calibration gating (round 10 — r9 verdict item 1): the headline
min-of-N folds over IN-BAND passes only — a pass whose pinned Spark
calibration row exceeds the round's best pass by ``CALIB_REL_TOL`` is
discarded and re-run (up to ``SPARK_GRAFT_BENCH_MAX_EXTRA`` extras);
the artifact carries ``host_degraded`` (best pass vs the stored
clean-window anchor ``CALIB_REF``), ``calib_spark_ratio``, and
``queries_min_norm`` / ``value_min_norm`` (calib-normalized trend
rows).  See the CALIB_REF comment below for why the gate is relative
in-round and only the STAMP is absolute.  The driver's stdout capture holds only the last
~2000 chars, so the compact line stays minimal and the per-run detail
lands in ``BENCH_FULL.json`` next to this script (rewritten every
invocation; committed per round).  ``SPARK_GRAFT_BENCH_SUBPROC=0``
falls back to in-process passes (used by the child passes themselves).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# --- calibration gating (round 10 — r9 verdict item 1) -------------------
# CALIB_REF is the stored clean-window anchor: the r9 mid-round pass on
# an undegraded host (numpy gemm 0.0314 s, pinned Spark sum 0.0747 s —
# SCALING.md "Host-calibration rows").  It is the cross-round
# NORMALIZATION denominator, not an absolute pass/fail bar: containers
# differ round-to-round (r10's idle box reads gemm ~0.07 / spark ~0.15
# all day), so absolute gating would discard every pass on a slower
# container and thrash forever.  Instead:
#   * RELATIVE gate: a pass whose pinned Spark calib exceeds the round's
#     best pass by CALIB_REL_TOL ran in a TRANSIENT degraded window —
#     it is discarded and (budget permitting) re-run; the headline
#     min-of-N folds over in-band passes only.
#   * ABSOLUTE stamp: if even the best pass's calib exceeds
#     CALIB_REF * CALIB_ABS_TOL the whole round ran on a slow host —
#     the artifact is stamped host_degraded (nothing to re-run into).
#   * NORMALIZED rows: queries_min_norm divides each pass's raw time by
#     that pass's spark-calib ratio to the anchor, then min-folds —
#     the cross-round trend table that "divides by the band
#     automatically".  It over-corrects pure-CPU (pandas-UDF) rows —
#     read it next to the gemm ratio, also emitted.
CALIB_REF = {"numpy_gemm_1536_s": 0.0314, "spark_sum_50m_s": 0.0747}
CALIB_REL_TOL = float(os.environ.get("SPARK_GRAFT_CALIB_REL_TOL", "1.35"))
CALIB_ABS_TOL = float(os.environ.get("SPARK_GRAFT_CALIB_ABS_TOL", "1.5"))

# Every name here is on the driver-checked main surface
# (registry.queries()) — the bench trends exactly what ships.  Round 4
# dropped the retired extras (knn_join, q_events_sliding,
# search_filtered_warm) and added the driver-green flagships that had no
# trend line (knn_join_blocked, ann_ivf_planted, search_text_query,
# dedup_lsh_embedding, curate_survivors).
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_region_revenue",
    "q_top_orders_per_customer",
    "q_part_cube",
    "q_value_percentiles",
    "q_events_hourly",
    "q_events_sessions",
    "q_events_asof",
    "q_events_range_join",
    "search_topk",
    "search_filtered",
    "search_topk_warm",
    "search_text_query",
    "hybrid_search_rrf",
    "search_sq8",
    "knn_join_blocked",
    "ann_ivf_planted",  # index BUILD trend (retired extra; probe is the serving row)
    "ann_ivf_probe",
    "pq_probe",
    "ivfpq_probe",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_lsh_embedding",
    "dedup_semantic_probe",
    "dedup_clusters",
    "dedup_repeated_spans",  # round-8 span-level substring signal
    "doc_dup_fraction",  # round-9 per-doc duplicated-ngram quality score
    "drift_by_source",       # round-8 grouped drift statistic
    "decontaminate",
    "pii_redact",
    "boilerplate_removal",
    "chunk_overlap",
    "text_stats",
    "tfidf_top_terms",
    "lm_quality",
    "doc_quality_signals",  # round-10 fused per-doc signal row
    "quality_signal_summary",  # round-11 gate statistic (one bounded row)
    "quality_model_scores",    # round-11 artifact-scored LR classifier
    "dedup_exact_nfc",         # round-12 Unicode-normalized fingerprint fold

    "multimodal_features",
    "upsert_merge",
    "quota_sample_sources",
    "pack_sequences_q",
    "curate_survivors",
]


def _one_pass_subprocess() -> dict:
    """One pass in its own python/JVM process — temporal AND process
    isolation between passes, so a host stall window or accumulated JVM
    state cannot span them."""
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        out_path = tf.name
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_SUBPROC"] = "0"  # child runs in-process
    try:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one-run", out_path],
            check=True,
            env=env,
            stdout=sys.stderr,  # keep the parent's stdout tail clean
        )
        with open(out_path) as f:
            return json.load(f)
    finally:
        try:
            os.remove(out_path)
        except OSError:
            pass


def _in_band_indices(calibs: list[dict | None]) -> list[int]:
    """Indices of passes whose pinned Spark calibration is within
    CALIB_REL_TOL of the round's best pass (see module-top rationale).
    Passes with no calibration row count as in-band (legacy runs)."""
    spark_times = [
        (c or {}).get("spark_sum_50m_s") for c in calibs
    ]
    known = [t for t in spark_times if t is not None]
    if not known:
        return list(range(len(calibs)))
    best = min(known)
    return [
        i
        for i, t in enumerate(spark_times)
        if t is None or t <= best * CALIB_REL_TOL
    ]


def _setup_and_measure(run_idx: int) -> dict:
    """Full session setup + ONE measurement pass (the per-process unit)."""
    from readwise_vector_db_spark.session import get_spark

    import readwise_vector_db_spark.suites  # noqa: F401  (populates registry)

    # bench the full surface: driver-facing registry + retired extras
    from readwise_vector_db_spark.registry import all_queries

    spark = get_spark("bench")
    qs = all_queries()
    from readwise_vector_db_spark.registry import queries as main_queries

    # every benched name must exist; everything except the explicitly
    # kept-for-trend build row must be on the driver-checked surface
    missing = [n for n in HEADLINE if n not in qs]
    assert not missing, f"bench names not registered: {missing}"
    # ann_ivf_planted / dedup_semantic_probe / boilerplate_removal /
    # pq_probe: kept-for-trend extras (the BUILD row, the quantizer-probe
    # serving row, the round-6 CCNet boilerplate pass, and the PQ ADC
    # serving row); all pass the stricter local oracle gate
    # (tools/oracle_check.py)
    off_surface = [
        n for n in HEADLINE
        if n not in main_queries()
        and n not in (
            "ann_ivf_planted",
            "dedup_semantic_probe",
            "boilerplate_removal",
            "pq_probe",
            "ivfpq_probe",
            "hybrid_search_rrf",
            "lm_quality",
            "dedup_repeated_spans",
            "drift_by_source",
            "doc_dup_fraction",
            "doc_quality_signals",
            "quality_signal_summary",
            "quality_model_scores",
            "dedup_exact_nfc",
        )
    ]
    assert not off_surface, f"bench names not on the driver surface: {off_surface}"

    # Warm the one-time machinery every query shares — codegen infra, the
    # parquet reader, shuffle service, noop committer — with a query that
    # is NOT one of the measured ones (region: 5 rows).  Otherwise the
    # first measured query absorbs session-init cost that isn't its own.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(f"{SF_DIR}/region.parquet")
    warm.groupBy("r_name").count().write.format("noop").mode("overwrite").save()
    # fork the Python workers once (reused afterwards) so the first
    # pandas-UDF query isn't charged 32 process spawns
    import pandas as _pd  # noqa: F401

    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    # offline index build for the warm serving path — the analogue of the
    # reference's prebuilt HNSW index, which its latency gate also excludes
    from readwise_vector_db_spark.sources.search_index import build_search_index

    build_search_index(spark, SF_DIR)
    # offline IVF artifact build — ann_ivf_probe measures SERVING (probe
    # over the persisted index), so the one-time build must not leak
    # into its first rep
    from readwise_vector_db_spark.suites.similarity import planted_ivf_artifact

    planted_ivf_artifact(spark, SF_DIR)

    run_calib = _calibrate(spark)
    t_start = time.time()
    run = _measure(spark, qs, run_idx)
    run["window_epoch"] = [round(t_start, 1), round(time.time(), 1)]
    run["calibration"] = run_calib
    return run


def _calibrate(spark) -> dict:
    """Fixed CPU-bound calibration rows (round 9 — r8 verdict missing
    #4): a pinned-size pure-numpy gemm (no Spark, no I/O — raw host
    FLOP throughput) and a pinned tiny Spark job (JVM + scheduler
    path), min-of-3 each.  Cross-round deltas divide by these to
    classify host-band shift vs real regression: a query row that moves
    with the calibration ratio moved with the HOST (r8's search_topk
    0.47→0.62 with zero plan change); one that moves against it is a
    plan/code change.  Sizes are pinned constants — changing them
    breaks cross-round comparability, so don't."""
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.standard_normal((1536, 1536))
    b = rng.standard_normal((1536, 1536))
    gemm = min(
        _timed(lambda: np.dot(a, b).sum() > -1e18) for _ in range(3)
    )
    spark_sum = min(
        _timed(
            lambda: spark.range(50_000_000)
            .selectExpr("sum(id * 2 + 1)")
            .collect()
        )
        for _ in range(3)
    )
    return {
        "numpy_gemm_1536_s": round(gemm, 4),
        "spark_sum_50m_s": round(spark_sum, 4),
    }


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def main() -> None:
    # --- measurement: N full passes, cross-run minima --------------------
    # Round-7 (r6 verdict item 2): ONE pass on this host can land in a
    # hypervisor-stall window and manufacture phantom regressions, so
    # the canonical artifact folds minima across ≥2 complete passes.
    # Round-8 (r7 verdict item 2): the passes are now ISOLATED — each in
    # its own process with a gap between them — and the full artifact
    # keeps every pass's per-query dict + wall-clock window, so an
    # elevated row is attributable instead of unexplained.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    subproc = os.environ.get("SPARK_GRAFT_BENCH_SUBPROC", "1") != "0"
    if len(sys.argv) >= 3 and sys.argv[1] == "--one-run":
        # child mode: one isolated pass, dumped to the given path
        run = _setup_and_measure(0)
        with open(sys.argv[2], "w") as f:
            json.dump(run, f)
        return
    gap = float(os.environ.get("SPARK_GRAFT_BENCH_GAP_SEC", "30"))
    max_extra = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_EXTRA", "2"))

    def one_pass(i: int) -> dict:
        if subproc and n_runs > 1:
            # the inter-pass gap belongs to ISOLATED passes (temporal
            # separation between fresh JVMs); the in-process quick mode
            # shares one JVM anyway and stays gap-free for iteration
            if i:
                time.sleep(gap)
            return _one_pass_subprocess()
        return _setup_and_measure(i)

    runs = [one_pass(i) for i in range(n_runs)]
    # calibration gate (r10): discard transiently-degraded passes and
    # re-run within budget, so one bad host window can't set the
    # committed headline (r9's final artifact ran BOTH passes degraded)
    extras = 0
    while (
        len(_in_band_indices([r.get("calibration") for r in runs])) < n_runs
        and extras < max_extra
    ):
        extras += 1
        runs.append(one_pass(len(runs)))
    in_band = _in_band_indices([r.get("calibration") for r in runs])
    band_runs = [runs[i] for i in in_band] or runs

    windows = [r.pop("window_epoch", None) for r in runs]
    calibs = [r.pop("calibration", None) for r in runs]
    out = _merge_runs(band_runs)
    out["n_runs"] = len(runs)
    out["n_runs_in_band"] = len(in_band)
    out["in_band_passes"] = in_band
    out["per_run_calibration"] = calibs
    out["per_run_value_min"] = [r["value_min"] for r in runs]
    out["per_run_queries"] = [r["queries"] for r in runs]
    out["per_run_queries_min"] = [r["queries_min"] for r in runs]
    out["per_run_window"] = windows
    out["pass_isolation"] = "subprocess" if (subproc and n_runs > 1) else "in-process"
    # absolute classification + normalized trend rows (see module top)
    ref = CALIB_REF["spark_sum_50m_s"]
    band_spark = [
        (calibs[i] or {}).get("spark_sum_50m_s") for i in in_band
    ]
    band_spark = [t for t in band_spark if t is not None]
    out["calib_ref"] = CALIB_REF
    out["calib_spark_ratio"] = (
        round(min(band_spark) / ref, 3) if band_spark else None
    )
    out["host_degraded"] = bool(
        band_spark and min(band_spark) > ref * CALIB_ABS_TOL
    )
    norm: dict[str, float] = {}
    for i in in_band:
        t = (calibs[i] or {}).get("spark_sum_50m_s")
        ratio = (t / ref) if t else 1.0
        for name, v in runs[i]["queries_min"].items():
            nv = v / ratio
            if name not in norm or nv < norm[name]:
                norm[name] = nv
    out["queries_min_norm"] = {k: round(v, 3) for k, v in norm.items()}
    out["value_min_norm"] = round(sum(norm.values()), 3)
    # composed filtered serving (round 11 — r10 verdict item 7): the
    # heavy 2-JVM × 4-regime study runs via `tools/bench_scaleout.py
    # filtered`, not per bench pass; its committed record (with its OWN
    # bracketing calibration rows) rides the artifact so the serving
    # block always names the latest measurement AND the host regime it
    # was taken in — provenance, not re-measurement.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "SERVING_FILTERED.json")
        ) as f:
            sf_rec = json.load(f)
        out["serving_filtered"] = {
            "source": "tools/bench_scaleout.py filtered (not per-pass)",
            "measured_at": sf_rec.get("measured_at"),
            "calib_spark_ratios": sf_rec.get("calib_spark_ratios"),
            "config": sf_rec.get("config"),
            "regimes": {
                name: {"best_p95": r["best_p95"], "best_qps": r["best_qps"]}
                for name, r in sf_rec.get("regimes", {}).items()
            },
        }
    except (OSError, ValueError, KeyError):
        pass  # study not run in this checkout — block simply absent

    # The per-run detail also lands as a FILE next to this script —
    # the driver's stdout tail holds only ~2000 chars, so BENCH_r{N}.json
    # alone can never carry per-run per-query values; BENCH_FULL.json is
    # the committed companion artifact a regression hunt reads.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_FULL.json")
    with open(full_path, "w") as f:
        json.dump(out, f, indent=1)

    # Two-line emission (round-6 fix for BENCH_r05.json "parsed": null):
    # the driver captures only the TAIL of stdout and parses the last
    # JSON line.  Round 5's single line carried every section and
    # outgrew the capture window, truncating its own front half.  So:
    # full artifact first (for humans / local tooling), then a compact
    # headline line LAST — minima only, well under any tail window.
    print(json.dumps(out))
    sys.stdout.flush()
    compact = {
        "metric": "total_wall_sec",
        "value": out["value_min"],
        "unit": "sec",
        "queries": out["queries_min"],
        "sf": out["sf"],
        "stat": "min_over_%d_in_band_runs" % len(in_band),
        "n_runs": len(runs),
        "n_runs_in_band": len(in_band),
        "calib": calibs,
        "calib_spark_ratio": out["calib_spark_ratio"],
        "host_degraded": out["host_degraded"],
        # one scalar, not the per-query norm dict — the compact line
        # must stay inside the driver's stdout-tail window; per-query
        # normalized values live in BENCH_FULL.json and are derivable
        # from queries × calib_spark_ratio (tools/trend.py does)
        "value_norm": out["value_min_norm"],
        "per_run_detail": "BENCH_FULL.json",
    }
    print(json.dumps(compact))


def _median(sorted_samples: list[float]) -> float:
    n = len(sorted_samples)
    return (
        sorted_samples[n // 2]
        if n % 2
        else (sorted_samples[n // 2 - 1] + sorted_samples[n // 2]) / 2
    )


def _pct(sorted_lat: list[float], q: float) -> float:
    return sorted_lat[min(len(sorted_lat) - 1, int(round(q * len(sorted_lat))) - 1)]


# throughput fields: a stall LOWERS them, so cross-run max is the
# stall-robust direction; everything else timing-shaped merges by min
_MAX_FIELDS = {
    "search_warm_conc_qps",
    "search_http_conc_qps",
    "streaming_events_per_sec",
    "embed_docs_per_sec",
}
_FIRST_FIELDS = {"metric", "unit", "sf", "search_warm_reps", "search_warm_conc_users"}


def _merge_scalar(key: str, vals: list):
    if key in _FIRST_FIELDS or isinstance(vals[0], str):
        return vals[0]
    if key in _MAX_FIELDS:
        return max(vals)
    return min(vals)


def _merge_runs(runs: list[dict]) -> dict:
    """Fold N complete measurement passes into one artifact: per-key min
    for times (max for throughputs), recursed one level into the section
    dicts; totals recomputed from the merged per-query maps."""
    if len(runs) == 1:
        return dict(runs[0])
    out: dict = {}
    for k, v in runs[0].items():
        if isinstance(v, dict):
            out[k] = {
                kk: _merge_scalar(kk, [r[k][kk] for r in runs]) for kk in v
            }
        else:
            out[k] = _merge_scalar(k, [r[k] for r in runs])
    out["value"] = round(sum(out["queries"].values()), 3)
    out["value_min"] = round(sum(out["queries_min"].values()), 3)
    return out


def _measure(spark, qs, run_idx: int) -> dict:
    median = _median
    pct = _pct

    # --- warm-path serving tails ----------------------------------------
    # The reference's latency gate is a P95 over warm searches from 20
    # CONCURRENT users (locustfile.py:37-48, 500 ms).  Two measurements:
    # (a) a sequential loop — ≥100 reps, because a P99 needs enough
    # samples that one hypervisor stall doesn't define the tail; (b) a
    # concurrent-client loop (default 6 threads × 20 requests against
    # the same warm session — Spark schedules concurrent jobs from
    # independent threads), the shape the reference's gate is measured
    # under.  Measured FIRST, before the batch query loop: a serving
    # process does not run 30 analytics queries concurrently, and the
    # GC/heap pressure those accumulate was measurably inflating the
    # tail percentiles of a loop run after them.
    spark._jvm.System.gc()
    p95_reps = int(os.environ.get("SPARK_GRAFT_P95_REPS", "100"))
    warm_fn = qs["search_topk_warm"]
    for _ in range(5):  # unmeasured: codegen + first-touch of the layout
        warm_fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    lat = []
    for _ in range(p95_reps):
        t0 = time.perf_counter()
        warm_fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p95, p99 = pct(lat, 0.95), pct(lat, 0.99)

    import concurrent.futures

    conc_users = int(os.environ.get("SPARK_GRAFT_CONC_USERS", "6"))
    conc_reps = int(os.environ.get("SPARK_GRAFT_CONC_REPS", "20"))

    def _user_loop(_uid: int) -> list[float]:
        out = []
        for _ in range(conc_reps):
            t0 = time.perf_counter()
            warm_fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            out.append(time.perf_counter() - t0)
        return out

    t_conc0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(max_workers=conc_users) as ex:
        conc_lat = sorted(
            x for res in ex.map(_user_loop, range(conc_users)) for x in res
        )
    conc_wall = time.perf_counter() - t_conc0
    conc_qps = len(conc_lat) / conc_wall if conc_wall > 0 else 0.0

    # --- HTTP surface (the reference gate's actual protocol) ------------
    # locustfile measures POST /search over HTTP with free-text queries;
    # this loop does the same against the stdlib server + warm service
    # (embed UDF → warm top-k → shape → JSON over the wire), with a
    # distinct query string per request so nothing is memoized.
    import json as _json
    import threading
    import urllib.request

    from readwise_vector_db_spark.api.http_server import serve as _serve
    from readwise_vector_db_spark.api.service import SearchService as _Svc

    _server = _serve(_Svc(spark, SF_DIR))
    threading.Thread(target=_server.serve_forever, daemon=True).start()
    _url = f"http://{_server.server_address[0]}:{_server.server_address[1]}/search"

    def _post(q: str) -> None:
        req = urllib.request.Request(
            _url,
            data=_json.dumps({"q": q, "k": 10}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            resp.read()

    try:
        for i in range(3):
            _post(f"warmup {i}")
        http_reps = int(os.environ.get("SPARK_GRAFT_HTTP_REPS", "60"))
        http_lat = []
        for i in range(http_reps):
            t0 = time.perf_counter()
            _post(f"bench query {i % 11} spark vector merge join")
            http_lat.append(time.perf_counter() - t0)
        http_lat.sort()

        def _http_user(uid: int) -> list[float]:
            out = []
            for i in range(12):
                t0 = time.perf_counter()
                _post(f"client {uid} request {i} semantic search")
                out.append(time.perf_counter() - t0)
            return out

        t0 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(max_workers=conc_users) as ex:
            http_conc = sorted(
                x for res in ex.map(_http_user, range(conc_users)) for x in res
            )
        http_conc_wall = time.perf_counter() - t0
    finally:
        _server.shutdown()
        _server.server_close()  # release the listening fd, not just the loop

    # 3 reps per pass × ≥2 passes = ≥6 samples per query spread across
    # temporally-separated windows — better stall coverage than 5 samples
    # in one window at similar total cost
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    from readwise_vector_db_spark.operators.dedup import release_detector_cache

    for name in HEADLINE:
        fn = qs[name]
        samples = []
        for _ in range(reps):
            # drain detector-internal persists BEFORE each rep: the r10
            # generation registry keeps the two newest calls' frames, so
            # without this reps 2+ would hit rep 1's internal caches and
            # the row would silently change meaning mid-trend (measured:
            # dedup_lsh_embedding 3.4 -> 1.1 "improvement" that was just
            # cache reuse).  Every rep measures the COLD end-to-end run,
            # the same semantics as every prior round.
            release_detector_cache()
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(median(samples), 3)
        timings_min[name] = round(samples[0], 3)
        # queries persist intermediates internally; drop them once this
        # query's reps are done so 20+ queries of accumulated cache don't
        # squeeze later queries into GC/eviction (isolated reruns showed
        # 2-4x inflation on the tail queries without this), and collect
        # the freed heap now so the pause lands between queries instead of
        # mid-measurement (ngram-jaccard median: 8.1 s -> 2.7 s)
        spark.catalog.clearCache()
        spark._jvm.System.gc()

    # --- curation pipeline, end-to-end composite -------------------------
    # The composed training-data funnel (quality -> lang -> exact dedup ->
    # near-dup -> versioned commit) benched as ONE unit: stage coupling
    # (persist reuse, shuffle sharing) is what a per-operator bench can't
    # see.  Timed once per rep including the snapshot write.
    import shutil
    import tempfile

    from readwise_vector_db_spark.jobs.curate import curate_corpus

    samples = []
    stage_walls: list[dict[str, float]] = []
    for _ in range(reps):
        out_root = tempfile.mkdtemp(prefix="bench_curate_")
        release_detector_cache()  # cold rep (see the query loop note)
        t0 = time.perf_counter()
        stats = curate_corpus(spark, SF_DIR, out_root)
        samples.append(time.perf_counter() - t0)
        stage_walls.append(
            {k[5:]: v for k, v in stats.items() if k.startswith("wall_")}
        )
        shutil.rmtree(out_root, ignore_errors=True)
    order = sorted(range(len(samples)), key=lambda i: samples[i])
    timings["curate_pipeline"] = round(median(sorted(samples)), 3)
    timings_min["curate_pipeline"] = round(samples[order[0]], 3)
    # per-stage wall of the FASTEST rep — decomposes the composite so a
    # regression names its stage instead of hiding in the total
    curate_stages = {k: round(v, 3) for k, v in stage_walls[order[0]].items()}
    spark.catalog.clearCache()
    spark._jvm.System.gc()

    # --- incremental dedup, batch-vs-store composite ----------------------
    # The ingest-side story (seed a store, then dedup an increment against
    # it) benched as one unit per layout half: "seed" = first commit into
    # an empty store, "increment" = a same-sized batch deduped against the
    # seeded store (historical exact anti-join + broadcast near-dup probe
    # + append commit).  Gives the incremental pipeline a trend line the
    # per-query rows can't (it is stateful — writes a versioned store).
    from pyspark.sql import functions as _Fi

    from readwise_vector_db_spark.jobs.incremental_dedup import (
        dedup_batch_against_store,
    )
    from readwise_vector_db_spark.sources.tables import load_table as _lt
    from readwise_vector_db_spark.sources.versioned import VersionedTable

    docs_inc = _lt(spark, SF_DIR, "documents").select("doc_id", "text")
    seed_s, inc_s = [], []
    for _ in range(reps):
        root = tempfile.mkdtemp(prefix="bench_incdedup_")
        table = VersionedTable(root)
        release_detector_cache()  # cold rep (see the query loop note)
        t0 = time.perf_counter()
        dedup_batch_against_store(
            spark, docs_inc.filter(_Fi.col("doc_id") % 2 == 0), table
        )
        t1 = time.perf_counter()
        dedup_batch_against_store(
            spark, docs_inc.filter(_Fi.col("doc_id") % 2 == 1), table
        )
        t2 = time.perf_counter()
        seed_s.append(t1 - t0)
        inc_s.append(t2 - t1)
        shutil.rmtree(root, ignore_errors=True)
    seed_s.sort()
    inc_s.sort()
    spark.catalog.clearCache()
    spark._jvm.System.gc()

    # --- semantic incremental dedup (embedding store) --------------------
    # Same composite for the embedding half of the incremental matrix
    # (round 6): quantizer trained ONCE (the persisted-artifact
    # economics), then seed + increment against the versioned
    # (id, v, norm, cell) store.  Fewer reps than the per-query rows —
    # the composite is ~10 s/rep and its variance story lives in
    # SCALING.md's flat-growth table.
    from readwise_vector_db_spark.jobs.incremental_dedup import (
        semantic_dedup_batch_against_store,
    )
    from readwise_vector_db_spark.operators.dedup import train_semantic_quantizer

    embs_inc = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    semq = train_semantic_quantizer(embs_inc, n_clusters=64)
    sem_seed_s, sem_inc_s = [], []
    for _ in range(max(2, reps // 2)):
        root = tempfile.mkdtemp(prefix="bench_semincdedup_")
        table = VersionedTable(root)
        release_detector_cache()  # cold rep (see the query loop note)
        t0 = time.perf_counter()
        semantic_dedup_batch_against_store(
            spark, embs_inc.filter(_Fi.col("vec_id") % 2 == 0), table, semq
        )
        t1 = time.perf_counter()
        # increment = the odd half plus a re-send of half the seed rows:
        # both accept and drop paths exercised
        semantic_dedup_batch_against_store(
            spark,
            embs_inc.filter(
                (_Fi.col("vec_id") % 2 == 1) | (_Fi.col("vec_id") % 4 == 0)
            ),
            table,
            semq,
        )
        t2 = time.perf_counter()
        sem_seed_s.append(t1 - t0)
        sem_inc_s.append(t2 - t1)
        shutil.rmtree(root, ignore_errors=True)
    sem_seed_s.sort()
    sem_inc_s.sort()
    spark.catalog.clearCache()
    spark._jvm.System.gc()

    # --- ANN quality: IVF recall@10 vs exact ----------------------------
    # Latency without recall is half a number for the one operator whose
    # speed comes from approximation: a mis-tuned IVF (too few probes,
    # degenerate KMeans) would look FASTER in the wall times above while
    # silently returning the wrong neighbors.  Same construction as
    # tests/test_similarity.py::test_ivf_recall_vs_exact, promoted here
    # so recall trends round-over-round next to the IVF wall time.
    # Config note: the fixture embeddings are near-uniform 64-d (no
    # cluster structure — IVF's worst case), so ≥0.9 recall needs
    # n_assign=2 multi-assignment and probing 8/16 cells; on a real
    # clustered corpus the same recall comes at a fraction of the probes.
    # Sweep on record (20 queries, sf0.1): single-assign nprobe 4/6/8 →
    # 0.58/0.68/0.83; n_assign=2 nprobe 6/8 → 0.88/0.94 (0.935 after the
    # capped coarse-quantizer training — see build_ivf_index).
    from pyspark.sql import functions as F

    from readwise_vector_db_spark.operators import similarity as sim
    from readwise_vector_db_spark.sources.tables import load_table

    n_recall_q = 20
    embs_t = load_table(spark, SF_DIR, "embeddings").persist()
    assigned, centroids = sim.build_ivf_index(embs_t, n_clusters=16, n_assign=2)
    assigned = assigned.persist()
    q_rows = (
        embs_t.filter(F.col("vec_id") < n_recall_q)
        .select("vec_id", "embedding")
        .collect()
    )
    exact_df = sim.knn_join(
        spark.createDataFrame(
            [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in q_rows],
            "query_id long, query_vec array<double>",
        ),
        embs_t,
        k=10,
        corpus_id="vec_id",
    )
    exact_sets: dict[int, set] = {}
    for r in exact_df.collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = []
    for r in q_rows:
        approx = {
            row["neighbor_id"]
            for row in sim.ivf_search(
                assigned,
                centroids,
                [float(x) for x in r["embedding"]],
                k=10,
                nprobe=8,
                multi_assigned=True,
            ).collect()
        }
        recalls.append(len(approx & exact_sets[int(r["vec_id"])]) / 10)
    ann_recall = sum(recalls) / len(recalls)
    spark.catalog.clearCache()

    # --- streaming throughput -------------------------------------------
    # The windowed-aggregation stream (streaming twin of q_events_hourly)
    # drained over the full events fixture in 4-file micro-batches:
    # events/sec through watermark + tumbling window + memory sink.
    # Measures the stateful-streaming path end-to-end, which the batch
    # entries above never touch.
    from readwise_vector_db_spark.sources.tables import load_table
    from readwise_vector_db_spark.streaming.windows import (
        read_event_stream,
        run_to_memory,
        tumbling_counts,
    )

    ev = load_table(spark, SF_DIR, "events")
    n_events = ev.count()
    ev_dir = tempfile.mkdtemp(prefix="bench_stream_")
    ev.repartition(16).write.mode("overwrite").parquet(ev_dir)
    t0 = time.perf_counter()
    run_to_memory(
        tumbling_counts(read_event_stream(spark, ev_dir, max_files=4)),
        f"bench_stream_r{run_idx}",  # unique per pass: memory-sink names collide
    )
    stream_wall = time.perf_counter() - t0
    shutil.rmtree(ev_dir, ignore_errors=True)

    # --- batch embedding throughput -------------------------------------
    # The ingest pipeline's compute stage: Arrow-batched pandas-UDF
    # embedding over every document (the reference's ingest is bound by
    # the OpenAI API; ours measures the distributed-UDF machinery with
    # the deterministic local embedder).  docs/sec through scan → UDF →
    # noop sink.
    from pyspark.sql import functions as _F

    from readwise_vector_db_spark.functions.embedder import deterministic_embedder

    docs = load_table(spark, SF_DIR, "documents", parallelize=True)
    n_docs = docs.count()
    emb_times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        docs.select("doc_id", deterministic_embedder()(_F.col("text")).alias("e")) \
            .write.format("noop").mode("overwrite").save()
        emb_times.append(time.perf_counter() - t0)
    emb_times.sort()
    emb_wall = emb_times[len(emb_times) // 2] if reps % 2 else (
        (emb_times[reps // 2 - 1] + emb_times[reps // 2]) / 2
    )

    # "sf0.1" -> 0.1; non-numeric tags (replicated corpora like "sfx10")
    # fall back to the tag string so the run still reports
    tag = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf: float | str = float(tag or 0)
    except ValueError:
        sf = tag
    out = {
        "metric": "total_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_min": timings_min,
        "value_min": round(sum(timings_min.values()), 3),
        "curate_stages_sec": curate_stages,
        "incremental_dedup_seed_sec": {
            "median": round(median(seed_s), 3),
            "min": round(seed_s[0], 3),
        },
        "incremental_dedup_increment_sec": {
            "median": round(median(inc_s), 3),
            "min": round(inc_s[0], 3),
        },
        "semantic_incremental_seed_sec": {
            "median": round(median(sem_seed_s), 3),
            "min": round(sem_seed_s[0], 3),
        },
        "semantic_incremental_increment_sec": {
            "median": round(median(sem_inc_s), 3),
            "min": round(sem_inc_s[0], 3),
        },
        "sf": sf,
        "search_warm_p95": round(p95, 3),
        "search_warm_p99": round(p99, 3),
        "search_warm_p50": round(lat[len(lat) // 2], 3),
        "search_warm_reps": p95_reps,
        "search_warm_conc_users": conc_users,
        "search_warm_conc_p50": round(conc_lat[len(conc_lat) // 2], 3),
        "search_warm_conc_p95": round(pct(conc_lat, 0.95), 3),
        "search_warm_conc_p99": round(pct(conc_lat, 0.99), 3),
        "search_warm_conc_qps": round(conc_qps, 1),
        "search_http_p50": round(http_lat[len(http_lat) // 2], 3),
        "search_http_p95": round(pct(http_lat, 0.95), 3),
        "search_http_conc_p95": round(pct(http_conc, 0.95), 3),
        "search_http_conc_qps": round(len(http_conc) / http_conc_wall, 1),
        "ann_recall_at_10": round(ann_recall, 3),
        "streaming_events_per_sec": int(n_events / stream_wall),
        "embed_docs_per_sec": int(n_docs / emb_wall),
    }
    return out


if __name__ == "__main__":
    main()
