"""Minimal CLI mirroring the reference's flock-cli surface
(flock-cli/src/main.rs:14-29: run benchmarks, fsql REPL).

    python -m flock_spark.cli fsql [--sf-dir DIR]       # interactive SQL
    python -m flock_spark.cli run QUERY [--sf-dir DIR]  # one registered query
    python -m flock_spark.cli list                      # registered queries

fsql registers the driver's tables as temp views and hands every line to
spark.sql — the reference's fsql is a REPL stub over DataFusion; this one is
a complete REPL over Catalyst.
"""

from __future__ import annotations

import argparse
import os
import sys


def _spark():
    from flock_spark.session import get_spark

    return get_spark("flock_spark_cli")


def cmd_list() -> int:
    from flock_spark.registry import REGISTRY, get_queries

    get_queries()
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        kind = "oracle" if spec.oracle else "rows-only"
        print(f"{name:40s} [{kind}] {', '.join(spec.tags)}")
    return 0


def cmd_run(name: str, sf_dir: str, limit: int) -> int:
    from flock_spark.registry import REGISTRY, get_queries

    get_queries()
    if name not in REGISTRY:
        print(f"unknown query: {name} (see `list`)", file=sys.stderr)
        return 2
    spark = _spark()
    REGISTRY[name].fn(spark, sf_dir).show(limit, truncate=False)
    return 0


def cmd_explain(name: str, sf_dir: str) -> int:
    """Print the formatted physical plan of a registered query — the
    plan-audit loop (see SCALE.md / tests/test_plans.py) as a one-liner."""
    from flock_spark.registry import REGISTRY, get_queries

    get_queries()
    if name not in REGISTRY:
        print(f"unknown query: {name} (see `list`)", file=sys.stderr)
        return 2
    spark = _spark()
    REGISTRY[name].fn(spark, sf_dir).explain("formatted")
    return 0


def cmd_fsql(sf_dir: str) -> int:
    from flock_spark.catalog import register_views

    spark = _spark()
    register_views(spark, sf_dir)
    print(f"fsql — Spark SQL over {sf_dir} (tables: region nation customer "
          "supplier part orders lineitem events documents embeddings). "
          "Ctrl-D to exit.")
    while True:
        try:
            line = input("fsql> ").strip()
        except EOFError:
            print()
            return 0
        if not line or line in {"exit", "quit"}:
            if line:
                return 0
            continue
        try:
            spark.sql(line).show(50, truncate=False)
        except Exception as exc:  # keep the REPL alive on bad SQL
            print(f"error: {exc}", file=sys.stderr)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="flock_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    pr = sub.add_parser("run")
    pr.add_argument("query")
    pr.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    pr.add_argument("--limit", type=int, default=20)
    pe = sub.add_parser("explain")
    pe.add_argument("query")
    pe.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    pf = sub.add_parser("fsql")
    pf.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    args = p.parse_args(argv)
    if args.cmd == "list":
        return cmd_list()
    if args.cmd == "run":
        return cmd_run(args.query, args.sf_dir, args.limit)
    if args.cmd == "explain":
        return cmd_explain(args.query, args.sf_dir)
    return cmd_fsql(args.sf_dir)


if __name__ == "__main__":
    raise SystemExit(main())
