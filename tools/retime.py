"""Standalone per-query retime with the bench's exact methodology:
session warm-up, one untimed pass, then min-of-N noop-sink passes.

Usage: python tools/retime.py [-n TRIALS] [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    trials = 3
    if args[:1] == ["-n"]:
        trials = int(args[1])
        args = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
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
