"""Tiny CLI over the query registry.

    python -m data_pipeline_etl_spark list [substring]
    python -m data_pipeline_etl_spark run <query> [--sf DIR] [--limit N]
    python -m data_pipeline_etl_spark oracle <query>

`run` executes the declared query on a local session and prints the
result (first N rows); `oracle` prints the DuckDB oracle SQL — useful
as documentation of the exact semantics. The registry itself stays
import-light; Spark only starts for `run`.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    from data_pipeline_etl_spark.registry import (
        ORACLES,
        QUERIES,
        QUERY_MODULES,
        load_all_operators,
    )

    p = argparse.ArgumentParser(prog="data_pipeline_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list", help="list declared queries")
    p_list.add_argument("substring", nargs="?", default="")
    p_run = sub.add_parser("run", help="run a declared query")
    p_run.add_argument("query")
    p_run.add_argument("--sf", default="/root/testdata/sf0.01")
    p_run.add_argument("--limit", type=int, default=20)
    p_oracle = sub.add_parser("oracle", help="print a query's oracle SQL")
    p_oracle.add_argument("query")
    args = p.parse_args(argv)

    load_all_operators()
    if args.cmd == "list":
        for name in sorted(QUERIES):
            if args.substring in name:
                kind = "oracle" if name in ORACLES else "rows-only"
                print(f"{name:32s} {QUERY_MODULES[name]:28s} {kind}")
        return 0
    if args.query not in QUERIES:
        print(f"unknown query: {args.query} (try `list`)", file=sys.stderr)
        return 2
    if args.cmd == "oracle":
        if args.query not in ORACLES:
            print(f"{args.query} is rows-only (no oracle)", file=sys.stderr)
            return 1
        print(ORACLES[args.query])
        return 0
    from data_pipeline_etl_spark.session import get_spark

    spark = get_spark("cli")
    df = QUERIES[args.query](spark, args.sf)
    # persist so show() + count() execute the query once, not twice
    df.persist()
    try:
        df.show(args.limit, truncate=False)
        print(f"({df.count()} rows total)")
    finally:
        df.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
