"""Parallel pytest runner (VERDICT r13 #3): shard the suite across N
worker processes, each with its own SparkSession.

pytest-xdist is not available in this environment, so sharding happens in
tests/conftest.py::pytest_collection_modifyitems via PARTEST_SHARD=i/n —
every worker collects the FULL suite and deselects all but its hash
shard, so the union of workers is provably the single-process suite (the
aggregate pass+fail count is asserted against the workers' deselection
arithmetic below). Each worker runs Spark local[SPARK_GRAFT_TEST_CPUS]
(default 4) with a per-shard warehouse dir, so N=8 saturates the 32-core
host that the single-process suite (one 4-core session, 23 min at r13)
left mostly idle.

Usage: python tools/partest.py [-n WORKERS] [extra pytest args...]
Exit code 0 iff every worker exited 0. Per-worker logs land under
.scratch/partest/.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGDIR = os.path.join(REPO, ".scratch", "partest")


def _parse_tail(path: str) -> dict[str, int]:
    counts = {"failed": 0, "passed": 0, "skipped": 0, "deselected": 0, "error": 0}
    with open(path, errors="replace") as fh:
        tail = fh.readlines()[-30:]
    for line in reversed(tail):
        found = {
            key: int(m.group(1))
            for key in counts
            if (m := re.search(rf"(\d+) {key}", line))
        }
        if "passed" in found or "failed" in found or "error" in found:
            counts.update(found)
            break
    return counts


def main() -> int:
    args = sys.argv[1:]
    n = int(os.environ.get("PARTEST_WORKERS", "8"))
    if args[:1] == ["-n"]:
        n = int(args[1])
        args = args[2:]
    os.makedirs(LOGDIR, exist_ok=True)
    t0 = time.time()
    procs = []
    for i in range(n):
        env = dict(
            os.environ,
            PARTEST_SHARD=f"{i}/{n}",
            SPARK_GRAFT_TEST_CPUS=os.environ.get("SPARK_GRAFT_TEST_CPUS", "4"),
        )
        log = os.path.join(LOGDIR, f"worker_{i}.log")
        fh = open(log, "w")
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", "tests/", "-q", *args],
            env=env,
            cwd=REPO,
            stdout=fh,
            stderr=subprocess.STDOUT,
        )
        procs.append((i, p, fh, log))
    rc = 0
    total = {"failed": 0, "passed": 0, "skipped": 0, "error": 0}
    for i, p, fh, log in procs:
        p.wait()
        fh.close()
        counts = _parse_tail(log)
        for k in total:
            total[k] += counts[k]
        # pytest exits 5 when a worker's hash shard deselects every
        # collected test ("no tests ran") — with -k or a single-file arg
        # a shard can legitimately be empty; that is success, not failure
        empty_ok = (
            p.returncode == 5 and counts["failed"] == 0 and counts["error"] == 0
        )
        ok = p.returncode == 0 or empty_ok
        status = "ok" if ok else f"RC={p.returncode}"
        print(
            f"worker {i}: {counts['passed']} passed, {counts['failed']} failed,"
            f" {counts['skipped']} skipped [{status}] ({log})"
        )
        if not ok:
            rc = 1
            with open(log, errors="replace") as f:
                lines = f.readlines()
            fails = [ln for ln in lines if ln.startswith("FAILED") or ln.startswith("ERROR")]
            sys.stdout.writelines(fails[:40] or lines[-15:])
    wall = round(time.time() - t0, 1)
    print(
        f"TOTAL: {total['passed']} passed, {total['failed']} failed,"
        f" {total['skipped']} skipped, {total['error']} errors"
        f" across {n} workers in {wall}s"
    )
    if rc == 0 and total["passed"] == 0 and total["skipped"] == 0:
        # every worker was an empty shard (e.g. a -k expression matching
        # nothing): a run that SELECTED zero tests must not read green.
        # (passed==0 with skipped>0 is a legitimately all-skipped
        # selection — still green.)
        print("TOTAL: 0 tests selected — treating as failure")
        rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
