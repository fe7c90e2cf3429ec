"""Driver-window rotation status: which registry entries have driver
CORRECTNESS history, and the mechanical promotion queue for next round.

The README "Registry window & verification tiers" policy says each round
promotes the OLDEST never-driver-verified entries first (ordered by query
number). This tool derives that queue from the actual CORRECTNESS_r*.json
history, so the rotation is a lookup, not an argument:

  python tools/rotation_status.py            # summary + queue
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def qnum(name: str) -> int:
    m = re.match(r"q(\d+)", name)
    return int(m.group(1)) if m else 10**9


def main() -> int:
    from syntenybrowserv2_etl_spark.queries import DRIVER_WINDOW, REGISTRY

    green: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_"):-len(".json")]
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("rows_match") and row.get(
                "hash_match"
            ):
                green.setdefault(name, []).append(rnd)

    names = list(REGISTRY)
    in_window = names[:DRIVER_WINDOW]
    never = sorted(
        (n for n in names if n not in green), key=qnum
    )
    print(f"registry: {len(names)}  window: {len(in_window)}")
    print(f"driver-green history: {len(green)} entries")
    print(f"never driver-verified: {len(never)}")
    print("\npromotion queue (oldest first — README rotation policy):")
    for n in never:
        tag = "IN-WINDOW (awaiting this round's drive)" if n in in_window else ""
        print(f"  {n} {tag}")
    demotable = sorted(
        (n for n in in_window if len(green.get(n, [])) >= 2),
        key=lambda n: -len(green.get(n, [])),
    )
    print(f"\ndemotion candidates in-window (≥2 driver-green rounds): "
          f"{len(demotable)}")
    for n in demotable[:15]:
        print(f"  {n} ({len(green[n])} rounds green)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
