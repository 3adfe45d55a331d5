"""CLI (reference ``main.py``: the ``rwv`` Typer app), stdlib argparse.

Commands:
  search "query" [--k N] [--lang L] [--source-type T] [--json]
  sync --backfill | --since SERVICE        (jobs/sync.py)
  mcp [--host H] [--port P]                (api/server.py)
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
from datetime import datetime, timezone

from readwise_vector_db_spark.session import DEFAULT_SF_DIR, get_spark


def _cmd_search(args: argparse.Namespace) -> int:
    from readwise_vector_db_spark.api.framing import ndjson_stream
    from readwise_vector_db_spark.api.models import SearchRequest
    from readwise_vector_db_spark.api.service import SearchService

    spark = get_spark("rwv-search")
    # one-shot query: cold path — no index build, no cache pinning
    svc = SearchService(spark, args.sf_dir, warm=False)
    req = SearchRequest(q=args.query, k=args.k, lang=args.lang, source_type=args.source_type)
    results = svc.search(req)
    if args.json:
        print(json.dumps({"results": results}, default=str))
    else:
        for line in ndjson_stream(results):
            sys.stdout.write(line)
    return 0


def _cmd_sync(args: argparse.Namespace) -> int:
    from readwise_vector_db_spark.jobs.sync import run_backfill, run_incremental_sync

    if args.backfill and args.since:
        # reference main.py:35-37: the two modes are mutually exclusive
        print("Error: --backfill and --since are mutually exclusive.")
        return 1
    since = None
    if args.since:
        try:
            since = datetime.fromisoformat(args.since.replace("Z", "+00:00"))
            if since.tzinfo is not None:
                since = since.astimezone(timezone.utc).replace(tzinfo=None)
        except ValueError:
            print(f"Error: --since must be an ISO 8601 date, got {args.since!r}")
            return 1
    spark = get_spark("rwv-sync")
    if args.backfill:
        n = run_backfill(spark, args.export_dir, args.store_dir)
    else:
        state = args.state_dir or f"{args.store_dir.rstrip('/')}_sync_state"
        n = run_incremental_sync(
            spark, args.export_dir, args.store_dir, state, since=since
        )
    print(json.dumps({"rows_upserted": n}))
    return 0


def _cmd_mcp(args: argparse.Namespace) -> int:
    from readwise_vector_db_spark.api.server import McpServer
    from readwise_vector_db_spark.api.service import SearchService

    spark = get_spark("rwv-mcp")
    svc = SearchService(spark, args.sf_dir)
    server = McpServer(svc, host=args.host, port=args.port)

    async def run() -> None:
        await server.start()
        print(json.dumps({"listening": f"{server.host}:{server.port}"}), flush=True)
        await server.serve_forever()

    try:
        asyncio.run(run())
    except KeyboardInterrupt:
        pass
    return 0


def _cmd_curate(args: argparse.Namespace) -> int:
    from readwise_vector_db_spark.jobs.curate import curate_corpus

    spark = get_spark("rwv-curate")
    lm_model = None
    if args.lm_artifact is not None:
        # persisted serving artifact (save_bigram_lm) — no retraining
        from readwise_vector_db_spark.operators.lm import load_bigram_lm

        # keep the 4-tuple: the artifact's add_k is part of the model —
        # scoring with a different smoothing than training contradicts
        # the honored-add_k contract batch_quality_signals documents
        lm_model = load_bigram_lm(args.lm_artifact)
    elif args.lm_ppl_max is not None or args.with_signals:
        # CCNet shape: train the reference LM on the target-language
        # slice of the corpus itself (stand-in for a curated wiki dump)
        from pyspark.sql import functions as F

        from readwise_vector_db_spark.operators.lm import train_bigram_lm
        from readwise_vector_db_spark.sources.tables import load_table

        ref = load_table(spark, args.sf_dir, "documents").filter(
            F.col("lang") == args.lang
        )
        lm_model = train_bigram_lm(
            ref, min_count=args.lm_min_count, max_vocab=args.lm_max_vocab
        )
    stats = curate_corpus(
        spark,
        args.sf_dir,
        args.out,
        min_quality=args.min_quality,
        lang=args.lang,
        near_dup_threshold=args.near_dup_threshold,
        semantic_threshold=args.semantic_threshold,
        boilerplate_min_df_frac=args.boilerplate_min_df_frac,
        lm_model=lm_model,
        lm_ppl_max=args.lm_ppl_max,
        with_signals=args.with_signals,
    )
    print(json.dumps(stats))
    return 0


def _cmd_maintain(args: argparse.Namespace) -> int:
    from readwise_vector_db_spark.maintenance import (
        MaintenancePolicy,
        maintain_index,
        read_maintenance_log,
    )

    if args.log:
        if args.all:
            from readwise_vector_db_spark.maintenance import (
                read_all_maintenance_logs,
            )

            for rec in read_all_maintenance_logs(args.path):
                print(json.dumps(rec))
        else:
            for rec in read_maintenance_log(args.path):
                print(json.dumps(rec))
        return 0
    if args.parallel != 1 and not args.all:
        print(
            "maintain --parallel applies only with --all (a single "
            "structure is one lease, one maintainer)",
            file=sys.stderr,
        )
        return 2
    spark = get_spark("rwv-maintain")
    if args.all:
        # single-structure-only flags would be silently meaningless over
        # a sweep (round-12 review) — refuse instead of ignoring
        for flag, name in (
            (args.rebuild_to, "--rebuild-to"),
            (args.dedup_store, "--dedup-store"),
            (args.build_band_index, "--build-band-index"),
        ):
            if flag:
                print(
                    f"maintain --all does not accept {name} (it targets "
                    "one structure) — run it against that structure's "
                    "path directly",
                    file=sys.stderr,
                )
                return 2
        from readwise_vector_db_spark.maintenance import maintain_all

        for rec in maintain_all(
            spark, args.path,
            policy=MaintenancePolicy(
                tombstone_frac_max=args.tombstone_frac_max,
                drift_ratio_max=args.drift_ratio_max,
            ),
            execute=not args.dry_run,
            sample_fraction=args.sample_fraction, lease_wait=args.wait,
            max_parallel=args.parallel,
        ):
            print(json.dumps(rec))
        return 0
    if args.dedup_store:
        from readwise_vector_db_spark.maintenance import (
            maintain_dedup_store,
        )

        rec = maintain_dedup_store(
            spark, args.path, execute=not args.dry_run,
            lease_wait=args.wait, build_index=args.build_band_index,
        )
        print(json.dumps(rec))
        return 0
    rec = maintain_index(
        spark,
        args.path,
        policy=MaintenancePolicy(
            tombstone_frac_max=args.tombstone_frac_max,
            drift_ratio_max=args.drift_ratio_max,
        ),
        execute=not args.dry_run,
        sample_fraction=args.sample_fraction,
        rebuild_to=args.rebuild_to,
        lease_wait=args.wait,
    )
    print(json.dumps(rec))
    return 0


def _cmd_http(args: argparse.Namespace) -> int:
    from readwise_vector_db_spark.api.http_server import serve
    from readwise_vector_db_spark.api.service import SearchService

    spark = get_spark("rwv-http")
    svc = SearchService(spark, args.sf_dir)
    server = serve(svc, host=args.host, port=args.port)
    host, port = server.server_address[:2]
    print(json.dumps({"listening": f"http://{host}:{port}"}), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="rwv-spark")
    p.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    sub = p.add_subparsers(dest="command", required=True)

    s = sub.add_parser("search", help="top-k semantic search")
    s.add_argument("query")
    s.add_argument("--k", type=int, default=20)
    s.add_argument("--lang", default=None)
    s.add_argument("--source-type", default=None)
    s.add_argument("--json", action="store_true", help="one JSON body, not NDJSON")
    s.set_defaults(fn=_cmd_search)

    y = sub.add_parser("sync", help="ingest readwise export → store")
    y.add_argument("--backfill", action="store_true",
                   help="backfill all legacy highlights from the export")
    y.add_argument("--since", default=None, metavar="ISO8601",
                   help="incremental sync of highlights updated since this date")
    y.add_argument("--export-dir", required=True)
    y.add_argument("--store-dir", required=True)
    y.add_argument("--state-dir", default=None)
    y.set_defaults(fn=_cmd_sync)

    m = sub.add_parser("mcp", help="JSON-RPC-over-TCP search server")
    m.add_argument("--host", default="127.0.0.1")
    m.add_argument("--port", type=int, default=0)
    m.set_defaults(fn=_cmd_mcp)

    c = sub.add_parser("curate", help="run the corpus-curation funnel")
    c.add_argument("--out", required=True, help="VersionedTable root for survivors")
    c.add_argument("--min-quality", type=float, default=0.4)
    c.add_argument("--lang", default="en")
    c.add_argument("--near-dup-threshold", type=float, default=0.6)
    c.add_argument(
        "--lm-ppl-max", type=float, default=None,
        help="enable the CCNet perplexity gate: drop documents whose "
        "bigram-LM perplexity (trained on the --lang slice) exceeds this",
    )
    c.add_argument(
        "--lm-min-count", type=int, default=2,
        help="prune LM n-gram counts below this before the driver collect "
        "(KenLM --prune analogue; bounds the broadcast artifact)",
    )
    c.add_argument(
        "--lm-max-vocab", type=int, default=None,
        help="cap the LM vocabulary at the top-N unigrams by frequency",
    )
    c.add_argument(
        "--semantic-threshold", type=float, default=None,
        help="enable the SemDeDup embedding stage at this cosine threshold",
    )
    c.add_argument(
        "--boilerplate-min-df-frac", type=float, default=None,
        help="enable the CCNet boilerplate pass: drop word segments "
        "present in at least this fraction of documents",
    )
    c.add_argument(
        "--with-signals", action="store_true",
        help="commit every survivor with its fused per-doc signal row "
        "(LM perplexity + repetition fractions + duplicated-n-gram "
        "fraction, one Arrow pass)",
    )
    c.add_argument(
        "--lm-artifact", default=None,
        help="path to a persisted bigram-LM layout (save_bigram_lm) — "
        "used for the perplexity gate and/or --with-signals instead of "
        "retraining on the --lang slice",
    )
    c.set_defaults(fn=_cmd_curate)

    mt = sub.add_parser(
        "maintain",
        help="autovacuum a persisted index layout: measure health, pick "
        "none/compact/recluster/rebuild, execute in-place repairs, log "
        "the decision",
    )
    mt.add_argument("--path", required=True, help="index layout root")
    mt.add_argument("--dry-run", action="store_true",
                    help="ANALYZE only: decide and log, execute nothing")
    mt.add_argument("--log", action="store_true",
                    help="print the layout's maintenance log and exit")
    mt.add_argument("--sample-fraction", type=float, default=1.0,
                    help="bound the health scan on huge layouts")
    mt.add_argument("--tombstone-frac-max", type=float, default=0.2)
    mt.add_argument("--drift-ratio-max", type=float, default=2.0)
    mt.add_argument("--parallel", type=int, default=1,
                    help="with --all: maintain up to N structures "
                         "concurrently (per-structure leases keep them "
                         "isolated)")
    mt.add_argument("--all", action="store_true",
                    help="treat --path as a ROOT: discover every index "
                         "layout and versioned store under it and run "
                         "the matching janitor on each (one sweep, one "
                         "decision-record schema); with --log, print "
                         "every structure's log annotated with its path")
    mt.add_argument("--build-band-index", action="store_true",
                    help="with --dedup-store: opt into the broadcast→"
                         "bucketed migration (build the band index for "
                         "a store that has none)")
    mt.add_argument("--dedup-store", action="store_true",
                    help="the path is an incremental dedup store root "
                    "(band-index sync/compaction + segment compaction) "
                    "rather than an ANN index layout")
    mt.add_argument("--rebuild-to", default=None,
                    help="execute a rebuild verdict blue/green into this "
                    "NEW layout root (ivf family — raw vectors resident); "
                    "repoint serving afterwards")
    mt.add_argument("--wait", type=float, default=0.0,
                    help="seconds to wait for a concurrent maintainer's "
                    "lease instead of refusing")
    mt.set_defaults(fn=_cmd_maintain)

    h = sub.add_parser("http", help="HTTP POST /search + SSE /mcp/stream server")
    h.add_argument("--host", default="127.0.0.1")
    h.add_argument("--port", type=int, default=0)
    h.set_defaults(fn=_cmd_http)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
