"""Unified maintenance entrypoint for the engine's stateful stores.

Every continuously-written store in the engine eventually needs the same
three maintenance passes, each documented on its own module:

  - COMPACT: fold per-batch files/sub-partitions back to one file per
    partition (``sources/io.compact_table`` for plain tables,
    ``fold_ib_partitions`` via each index's ``*_compact`` for the
    marker-append phrase/IVF indexes);
  - PRUNE: advance the committed-batch watermark and delete the markers
    (and leaked ``_pre`` snapshots) it subsumes
    (``sources/io.prune_batch_markers``);
  - REBUCKET: rescale a merge table's bucket count when the sizing rule
    (constant bytes per bucket) drifts (``streaming/merge.merge_rebucket``).

This tool just routes — all semantics live in the library functions — so
an operator schedules ONE command between micro-batches instead of
learning four modules:

  python tools/maintain.py prune <path> [--first-batch-id N]
  python tools/maintain.py compact-table <path> [--target-mb N]
  python tools/maintain.py compact-index <path>      # phrase index
  python tools/maintain.py compact-ivf <path>        # IVF-PQ index
  python tools/maintain.py rebucket <path> <new_n_buckets>

Run it like compaction: between batches, from one maintenance process.

Coverage note: every ``touched_bucket_fold`` state store (merge, scd2
open set, rollup grid, intervals, skyline, token-count drift monitor,
value-histogram KS monitor, shingle-count substring state, per-label
centroid embedding-health monitor) is maintained by ``prune`` alone — the fold's rename-swap leaves one
file per partition by construction, so there is nothing to compact, and
``compact-table`` REFUSES such stores (pinned by
tests/test_streaming.py::test_maintain_cli_covers_drift_state).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("prune", help="advance the committed-batch watermark")
    p.add_argument("path")
    p.add_argument("--first-batch-id", type=int, default=0)
    p.add_argument(
        "--trust-first-batch-id",
        action="store_true",
        help="acknowledge that --first-batch-id is the stream's genuine "
        "first id; without this (and without on-disk corroboration) a "
        "non-zero value is refused — a too-high value silently skips a "
        "crashed batch's redelivery",
    )

    p = sub.add_parser("compact-table", help="rewrite a parquet table to ~target-mb files")
    p.add_argument("path")
    p.add_argument("--target-mb", type=int, default=256)

    p = sub.add_parser("compact-index", help="fold the phrase index's committed batches")
    p.add_argument("path")

    p = sub.add_parser("compact-ivf", help="fold the IVF-PQ index's committed batches")
    p.add_argument("path")

    p = sub.add_parser("rebucket", help="rescale a merge table's bucket count")
    p.add_argument("path")
    p.add_argument("new_n_buckets", type=int)
    p.add_argument("--purge-tombstones", action="store_true")

    args = ap.parse_args()

    from syntenybrowserv2_etl_spark.session import get_spark

    spark = get_spark("maintain")
    if args.cmd == "prune":
        from syntenybrowserv2_etl_spark.sources.io import prune_batch_markers

        w = prune_batch_markers(
            spark,
            args.path,
            first_batch_id=args.first_batch_id,
            trust_first_batch_id=args.trust_first_batch_id,
        )
        print(f"watermark={w}")
    elif args.cmd == "compact-table":
        from syntenybrowserv2_etl_spark.sources.io import compact_table

        before, after = compact_table(spark, args.path, target_mb=args.target_mb)
        print(f"files {before} -> {after}")
    elif args.cmd == "compact-index":
        from syntenybrowserv2_etl_spark.operators.index import index_compact

        before, after = index_compact(spark, args.path)
        print(f"files {before} -> {after}")
    elif args.cmd == "compact-ivf":
        from syntenybrowserv2_etl_spark.operators.similarity import ivf_index_compact

        before, after = ivf_index_compact(spark, args.path)
        print(f"files {before} -> {after}")
    elif args.cmd == "rebucket":
        from syntenybrowserv2_etl_spark.streaming.merge import merge_rebucket

        old, new = merge_rebucket(
            spark, args.path, args.new_n_buckets,
            purge_tombstones=args.purge_tombstones,
        )
        print(f"n_buckets {old} -> {new}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
