"""CLI entry: ``python -m distributed_vector_database_spark <verb>``.

Closes the reference's declared CLI surface (O24) 1:1 the Spark way:
the reference ships a click CLI whose verbs are thin Thrift calls to
the coordinator (reference src/cli/main_cli.py:75-218 — put/get/
delete/search plus node management); here the same verbs drive the
VectorStore facade over a local parquet changelog, with two
deliberate upgrades:

- ``search --filter k=v`` and ``--threshold`` are HONORED (the
  reference parses both and silently drops them — the declared-but-
  dead surface; src/cli/main_cli.py:165-180 vs the handler that
  ignores req.filter/req.threshold);
- ``scan`` / ``compact`` / ``vacuum`` / ``stats`` expose the
  maintenance verbs the reference only offers over RPC.

Node management verbs (register_node/list_nodes, main_cli.py:30-73)
have no counterpart: Spark owns placement and membership (O15-O18
n/a per SURVEY §2.1).

argparse, not click: the container bakes in no third-party CLI deps,
and the verb surface is flat. Output is one JSON object per record on
stdout — machine-parseable, no ANSI color.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_kv(text: str | None, what: str) -> dict[str, str]:
    out: dict[str, str] = {}
    if not text:
        return out
    for item in text.split(","):
        if "=" not in item:
            raise SystemExit(f"bad {what} entry {item!r}: expected key=value")
        k, v = item.split("=", 1)
        out[k.strip()] = v.strip()
    return out


def _parse_vec(text: str) -> list[float]:
    try:
        return [float(x.strip()) for x in text.split(",")]
    except ValueError:
        raise SystemExit("bad vector: expected comma-separated numbers")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m distributed_vector_database_spark",
        description="Vector-store CLI over the Spark changelog facade",
    )
    p.add_argument("--store", required=True, help="store root directory")
    p.add_argument("--dim", type=int, required=True, help="vector dimension")
    p.add_argument(
        "--master", default="local[4]", help="Spark master (default local[4])"
    )
    sub = p.add_subparsers(dest="verb", required=True)

    sp = sub.add_parser("put", help="write/update one vector")
    sp.add_argument("--key", required=True)
    sp.add_argument("--vector", required=True, help="comma-separated floats")
    sp.add_argument("--metadata", help="key=value,key2=value2")

    sg = sub.add_parser("get", help="point lookup")
    sg.add_argument("--key", required=True)

    sd = sub.add_parser("delete", help="delete one vector")
    sd.add_argument("--key", required=True)

    ss = sub.add_parser("search", help="k-NN search")
    ss.add_argument("--query-vec", required=True, help="comma-separated floats")
    ss.add_argument("--top-k", type=int, default=5)
    ss.add_argument("--filter", help="metadata filter key=value,key2=value2")
    ss.add_argument(
        "--threshold", type=float, default=None,
        help="max squared-L2 score cutoff",
    )

    sub.add_parser("scan", help="dump live state as JSON lines")
    sub.add_parser("compact", help="fold the changelog into a snapshot")
    sv = sub.add_parser("vacuum", help="drop superseded snapshot versions")
    sv.add_argument("--keep-last", type=int, default=2)
    sub.add_parser("stats", help="store statistics")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    from distributed_vector_database_spark.store import VectorStore

    spark = (
        SparkSession.builder.master(args.master)
        .appName("dvdb-cli")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        store = VectorStore(spark, args.store, dim=args.dim)
        if args.verb == "put":
            store.put(
                args.key,
                _parse_vec(args.vector),
                _parse_kv(args.metadata, "metadata"),
            )
            print(json.dumps({"ok": True, "key": args.key}))
        elif args.verb == "get":
            rec = store.get(args.key)
            if rec is None:
                print(json.dumps({"ok": False, "key": args.key}))
                return 1
            print(json.dumps({"ok": True, **rec}))
        elif args.verb == "delete":
            store.delete(args.key)
            print(json.dumps({"ok": True, "key": args.key}))
        elif args.verb == "search":
            rows = store.search(
                _parse_vec(args.query_vec),
                top_k=args.top_k,
                filter=_parse_kv(args.filter, "filter"),
                threshold=args.threshold,
                include_payload=True,
            ).collect()
            for i, r in enumerate(rows, 1):
                print(
                    json.dumps(
                        {
                            "rank": i,
                            "key": r["key"],
                            "score": round(float(r["score"]), 6),
                            "metadata": dict(r["metadata"] or {}),
                        }
                    )
                )
        elif args.verb == "scan":
            for r in store.scan().toLocalIterator():
                print(
                    json.dumps(
                        {
                            "key": r["key"],
                            "vector": [float(v) for v in r["vector"]],
                            "metadata": dict(r["metadata"] or {}),
                        }
                    )
                )
        elif args.verb == "compact":
            n = store.compact()
            print(json.dumps({"ok": True, "rows": n}))
        elif args.verb == "vacuum":
            n = store.vacuum(keep_last=args.keep_last)
            print(json.dumps({"ok": True, "removed": n}))
        elif args.verb == "stats":
            print(json.dumps(store.stats(), default=str))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
