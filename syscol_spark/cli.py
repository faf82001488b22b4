"""CLI surface (C1 parity): the reference dispatches
``help|scheduler|start|stop|update|status`` (/root/reference/cli.go:44-58).

Spark owns scheduling, so `scheduler` collapses into session startup and the
lifecycle verbs drive one CollectorManager within a single process run:

    python -m syscol_spark.cli run --hosts h1,h2 --topic metrics \
        --producer-properties producer.properties [--transform avro \
        --schema-registry-url URL] [--duration 10]

    python -m syscol_spark.cli validate --topic t ...   # F4 gate, no session
    python -m syscol_spark.cli describe                 # engine + catalog info
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_config_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--producer-properties", default="")
    p.add_argument("--topic", default="")
    p.add_argument("--transform", default="none", choices=["none", "avro"])
    p.add_argument("--schema-registry-url", default="")
    p.add_argument("--hosts", default="localhost")
    p.add_argument("--port", type=int, default=5051)
    p.add_argument("--namespace", default="")
    p.add_argument("--interval", type=float, default=1.0)


def _config_from(args: argparse.Namespace):
    from syscol_spark.config import CollectorConfig

    return CollectorConfig(
        producer_properties=args.producer_properties,
        topic=args.topic,
        transform=args.transform,
        schema_registry_url=args.schema_registry_url,
        hosts=[h for h in args.hosts.split(",") if h],
        port=args.port,
        namespace=args.namespace,
        reporting_interval_secs=args.interval,
    )


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="syscol-spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run", help="start the collection pipeline (start+status+stop)")
    _add_config_args(run_p)
    run_p.add_argument("--duration", type=float, default=10.0, help="seconds to run before stopping")
    run_p.add_argument("--checkpoint", default="", help="checkpoint dir (resume from a prior run)")
    run_p.add_argument("--key-by-slave", action="store_true")

    val_p = sub.add_parser("validate", help="check the start gate (F4) without a session")
    _add_config_args(val_p)

    sub.add_parser("describe", help="print engine/catalog summary as JSON")

    q_p = sub.add_parser("query", help="run a catalog query and print JSONL rows")
    q_p.add_argument("name", help="query name (see `describe`)")
    q_p.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="table directory")
    q_p.add_argument(
        "--limit", type=int, default=20, help="max rows printed (0 = capped at 1000; use --all)"
    )
    q_p.add_argument(
        "--all",
        action="store_true",
        help="print every row, streamed partition-at-a-time (never a full driver collect)",
    )

    serve_p = sub.add_parser("serve", help="run the HTTP control plane (≈ reference `cli scheduler`)")
    serve_p.add_argument("--bind", default="127.0.0.1")
    serve_p.add_argument("--control-port", type=int, default=0)
    serve_p.add_argument("--duration", type=float, default=0.0, help="seconds to serve (0 = forever)")

    # client verbs: GET the control API (reference cli.go:140-164 / api.go)
    for verb in ("start", "stop", "status"):
        cp = sub.add_parser(verb, help=f"call /api/{verb} on a running control server")
        cp.add_argument("--api", default="", help="control server URL (or $SYSCOL_API)")
    up = sub.add_parser("update", help="call /api/update on a running control server")
    up.add_argument("--api", default="")
    up.add_argument("params", nargs="*", help="key=value pairs, reference names (topic=…, transform=…)")

    args = parser.parse_args(argv)

    if args.cmd == "validate":
        ok, reason = _config_from(args).can_start()
        print(json.dumps({"can_start": ok, "reason": reason}))
        return 0 if ok else 1

    if args.cmd == "describe":
        from syscol_spark import __version__
        from syscol_spark.plans.catalog import oracle_sql_catalog, query_catalog

        print(
            json.dumps(
                {
                    "version": __version__,
                    "n_queries": len(query_catalog()),
                    "n_oracles": len(oracle_sql_catalog()),
                    "queries": sorted(query_catalog()),
                }
            )
        )
        return 0

    if args.cmd == "query":
        from syscol_spark.plans.catalog import query_catalog
        from syscol_spark.session import get_session

        cat = query_catalog()
        if args.name not in cat:
            print(json.dumps({"error": f"unknown query {args.name!r}; run `describe` for the list"}), file=sys.stderr)
            return 1
        df = cat[args.name](get_session("syscol-query"), args.sf_dir)
        # the display path must never be an unbounded driver pull: --all
        # streams partitions through toLocalIterator (one partition resident
        # at a time); otherwise the collect is capped (default 20, --limit 0
        # falls back to 1000 rather than collecting everything)
        if args.all:
            rows = df.toLocalIterator()
        else:
            rows = iter(df.limit(args.limit if args.limit > 0 else 1000).collect())
        for row in rows:
            print(json.dumps(row.asDict(recursive=True), default=str))
        return 0

    if args.cmd in ("start", "stop", "status", "update"):
        import os
        import urllib.error
        import urllib.parse
        import urllib.request

        api = args.api or os.environ.get("SYSCOL_API", "")
        if not api:
            print(json.dumps({"error": "no control server: pass --api or set SYSCOL_API"}), file=sys.stderr)
            return 1
        path = f"/api/{args.cmd}"
        if args.cmd == "update":
            pairs = dict(p.split("=", 1) for p in args.params if "=" in p)
            path += "?" + urllib.parse.urlencode(pairs)
        try:
            with urllib.request.urlopen(api.rstrip("/") + path) as resp:  # noqa: S310
                print(resp.read().decode())
                return 0
        except urllib.error.HTTPError as e:
            print(e.read().decode())
            return 1

    if args.cmd == "serve":
        from syscol_spark.session import get_session
        from syscol_spark.streaming.control import CollectorManager
        from syscol_spark.streaming.http_control import ControlServer

        spark = get_session("syscol-control")
        ctl = ControlServer(CollectorManager(spark), host=args.bind, port=args.control_port)
        addr = ctl.start()
        print(json.dumps({"serving": addr}), flush=True)
        try:
            if args.duration > 0:
                time.sleep(args.duration)
            else:  # pragma: no cover — interactive mode
                while True:
                    time.sleep(3600)
        finally:
            ctl.shutdown()
        return 0

    # run
    from syscol_spark.session import get_session
    from syscol_spark.streaming.control import CollectorManager

    config = _config_from(args)
    ok, reason = config.can_start()
    if not ok:
        print(json.dumps({"error": f"cannot start: {reason}"}), file=sys.stderr)
        return 1
    spark = get_session("syscol-cli")
    mgr = CollectorManager(spark, config)
    mgr.start(checkpoint_dir=args.checkpoint or None, key_by_slave=args.key_by_slave)
    try:
        time.sleep(args.duration)
        print(json.dumps(mgr.status(), default=str))
    finally:
        mgr.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
