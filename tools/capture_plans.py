"""Capture .explain('formatted') for registry queries → plans/r17/.

Usage: python tools/capture_plans.py <outdir> [sf_dir] [query ...]

Writes one <query>.txt per entry (default: every registry entry) with the
formatted physical plan at the given sf_dir (default sf0.1). Plans are
captured pre-execution (AdaptiveSparkPlan isFinalPlan=false) — the shape
evidence the optimization round diffs: Exchange count, join strategy,
PushedFilters/ReadSchema, codegen spans, Python-boundary nodes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    from syntenybrowserv2_etl_spark import queries as q
    from syntenybrowserv2_etl_spark.session import get_spark

    spark = get_spark("capture_plans")
    targets = names or list(q.REGISTRY)
    for name in targets:
        try:
            df = q.REGISTRY[name].spark_fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture the failure, keep going
            plan = f"ERROR capturing plan: {e}\n"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else "ERROR")


if __name__ == "__main__":
    main()
