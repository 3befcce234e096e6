"""Dump .explain('formatted') for registry entries to plans/<dir>/.

Usage: python tools/dump_plans.py <out_subdir> <suffix> name [name ...]
Writes plans/<out_subdir>/<name>_<suffix>.txt for each entry, using the
bench session (get_spark) and the bench sf dir.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("FLOCK_SPARK_NEXMARK_EVENTS", "50000")

from flock_spark.registry import REGISTRY, get_queries  # noqa: E402
from flock_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", out_dir)
    os.makedirs(base, exist_ok=True)
    get_queries()
    spark = get_spark("flock_spark_plans")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(base, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
