"""Per-query job/stage/task counts via SparkStatusTracker (VERDICT r17 #2:
make parallelism claims measurable — the sf0.1 bench's 8-vs-32-core wall
ratios sit at ~1.0 because 13/15 headline queries are under a second and
job-latency-bound, so task-level counts are the scale evidence: a fan_out
path must show >1 task in its scan stage where the 1-row-group parquet
would otherwise plan exactly 1).

Usage: python tools/jobstats.py [sf_dir] query [query ...]

Runs each query once through the noop sink inside its own job group and
prints one JSON line per query:
  {"query": ..., "n_jobs": ..., "n_stages": ..., "n_tasks": ...,
   "max_stage_tasks": ...}

``n_jobs`` counts blocking actions (each localCheckpoint / collect /
broadcast-materialization is a separate job — the per-round latency an
iterative operator pays); ``max_stage_tasks`` is the widest stage, the
upper bound on observed parallelism.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def query_jobstats(spark, fn, sf_dir: str, group: str) -> dict:
    """Run ``fn(spark, sf_dir)`` through the noop sink under ``group`` and
    return job/stage/task counts from the status tracker."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    finally:
        sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup(group)
    stage_ids: set[int] = set()
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info is not None:
            stage_ids.update(info.stageIds)
    n_tasks = 0
    max_stage = 0
    n_stages = 0
    for sid in stage_ids:
        sinfo = tracker.getStageInfo(sid)
        if sinfo is None:  # skipped stage (reused exchange) — no tasks ran
            continue
        n_stages += 1
        n_tasks += sinfo.numTasks
        max_stage = max(max_stage, sinfo.numTasks)
    return {
        "n_jobs": len(job_ids),
        "n_stages": n_stages,
        "n_tasks": n_tasks,
        "max_stage_tasks": max_stage,
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    from syntenybrowserv2_etl_spark import queries as q
    from syntenybrowserv2_etl_spark.session import get_spark

    spark = get_spark("jobstats")
    for name in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        q.t(spark, sf_dir, name).count()
    for name in args or list(q.REGISTRY):
        fn = q.REGISTRY[name].spark_fn
        stats = query_jobstats(spark, fn, sf_dir, f"jobstats:{name}")
        print(json.dumps({"query": name, **stats}), flush=True)


if __name__ == "__main__":
    main()
