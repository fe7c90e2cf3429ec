"""Standalone per-query retime with the bench's exact methodology:
session warm-up, one untimed pass, then min-of-N noop-sink passes.

Usage: python tools/retime.py [-n TRIALS] [--sf-dir DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # explicit --sf-dir flag (ADVICE r17: the old positional sniff via
    # os.path.isdir(args[0]) silently ate a query name that happened to
    # collide with a local directory)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-n", dest="trials", type=int, default=3)
    ap.add_argument("--sf-dir", dest="sf_dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    ns = ap.parse_args()
    trials, sf_dir, args = ns.trials, ns.sf_dir, ns.queries
    from syntenybrowserv2_etl_spark import queries as q
    from syntenybrowserv2_etl_spark.session import get_spark

    spark = get_spark("retime")
    for name in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        q.t(spark, sf_dir, name).count()
    for name in args:
        fn = q.REGISTRY[name].spark_fn
        spark.sparkContext.setJobDescription(f"retime:{name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{best:8.3f}  {name}", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
