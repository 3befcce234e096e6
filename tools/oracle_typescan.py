"""Scan every registered oracle's DuckDB output types for non-portable
output columns: HUGEINT/UHUGEINT/DECIMAL widths and LIST/STRUCT/MAP nesting.

DuckDB promotes sum(INT/BIGINT) to HUGEINT (int128); the external driver
hashes int128 differently from Spark's int64 even when values are equal
(round-3 root cause of all 6 red driver rows). Round 6 added the nesting
rule: the driver's canonicalizer pandas-sorts result columns and dies on
list cells (`TypeError: unhashable type: 'list'` — all 4 r6 reds), so no
oracle may OUTPUT a LIST/STRUCT/MAP column either; serialize arrays to
strings at the output boundary (array_to_string / array_join — canonical
when the array order is pinned). This scan is the mechanical detector: run
it after adding/changing any oracle.

Usage: python tools/oracle_typescan.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

from flock_spark.catalog import TABLE_NAMES  # noqa: E402
from flock_spark import registry  # noqa: E402

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")
# DuckDB type-id names for nested output columns (r6 driver canonicalizer
# hazard: unhashable list cells in its pandas sort)
BANNED_IDS = ("list", "struct", "map", "array")


def scan(sf_dir: str) -> dict[str, list[tuple[str, str]]]:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    bad: dict[str, list[tuple[str, str]]] = {}
    for name, sql in registry.get_oracles().items():
        rel = con.sql(sql)
        hits = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if any(b in str(t).upper() for b in BANNED)
            or t.id in BANNED_IDS
        ]
        if hits:
            bad[name] = hits
    con.close()
    return bad


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    bad = scan(sf_dir)
    for name, hits in sorted(bad.items()):
        print(f"{name}: {hits}")
    print(f"\n{len(bad)} oracles with banned output types")
    sys.exit(1 if bad else 0)
