"""Pareto frontier (skyline) — the non-dominated rows under simultaneous
minimization of two metrics.

A curation/analytics primitive the other operators don't cover: "the
price/latency trade-off frontier", "the shortest-yet-highest-quality
documents", "cheapest-earliest orders". A row is ON the frontier iff no
other row is ≤ it in BOTH metrics and < in at least one (strict Pareto
dominance; exact duplicates of a frontier point are all kept — neither
strictly dominates the other).

Scale design — the naive formulation and why this isn't it:
- the textbook SQL (`NOT EXISTS` dominance anti-join, which the q130
  oracle deliberately uses as an independent formulation) is a quadratic
  self-join — dead at corpus scale;
- a single global sort + running-min sweep is O(n log n) but the window
  has no partition key: one task sees every row.

The classic two-phase distributed skyline instead:
  1. LOCAL skylines: every partition filters to its own non-dominated
     rows with the sweep (sorted by x, a row survives iff its y beats the
     running min of every earlier-x row — with x-ties handled by a
     same-x strict-y test). Implemented as ``mapInPandas`` over whatever
     partitioning the data already has (ANY subset's skyline is a
     SUPERSET of the global frontier members it contains, so no
     re-partitioning is needed and no correct row can be lost) — a
     vectorized Arrow batch sort + cummin, not a row loop.
  2. GLOBAL phase: the surviving candidates (typically ≪ n; honestly,
     anti-correlated adversarial data can keep many — document the data,
     not the dream) coalesce to one partition and the same sweep runs
     once more, yielding exactly the frontier.

Total cost: one narrow pass over the data + one small gather — zero
shuffles of the full input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Rows minimizing (``x_col``, ``y_col``) in the strict-Pareto sense
    (module docstring). NULL metric values are dropped (dominance is
    undefined against NULL). Output schema = input schema; duplicates of
    a frontier point all survive.
    """
    import pandas as pd

    cols = df.columns
    schema = df.schema

    def sweep(pdf):
        pdf = pdf.dropna(subset=[x_col, y_col])
        if pdf.empty:
            return pdf
        s = pdf.sort_values([x_col, y_col], kind="mergesort")
        # strictly-better-y seen at strictly-smaller x:
        # groupwise min y per x, cummin over increasing x, shifted
        # so each x-group compares against SMALLER x only
        gmin = s.groupby(x_col, sort=True)[y_col].min().cummin().shift(1)
        prev_best = s[x_col].map(gmin)
        # same-x strict dominance: a row loses to a smaller y at its
        # own x
        own_min = s.groupby(x_col)[y_col].transform("min")
        keep = ~(
            (prev_best.notna() & (prev_best <= s[y_col]))
            | (s[y_col] > own_min)
        )
        return s[keep]

    def local_skyline(batches):
        # PER-BATCH sweep: each Arrow batch is a subset, and any subset's
        # skyline is a superset of its global-frontier members, so
        # over-retention across batch boundaries is safe here (phase 2
        # culls it) and memory stays one batch at a time
        for pdf in batches:
            out = sweep(pdf)
            if not out.empty:
                yield out

    def global_skyline(batches):
        # the global pass MUST see every candidate in ONE sweep: Arrow
        # hands the coalesced partition over in maxRecordsPerBatch
        # (default 10k) chunks, and a per-batch sweep would never compare
        # a batch-2 row against the batch-1 row that dominates it —
        # dominated rows would leak into the "exact" frontier exactly on
        # the >10k-candidate inputs the operator exists for (round-11
        # review catch, pinned by test_pareto_frontier_many_candidates).
        # Memory bound = the phase-1 candidate union, the standard
        # two-phase-skyline assumption (document the data, not the dream).
        pdfs = [pdf for pdf in batches]
        if pdfs:
            out = sweep(pd.concat(pdfs, ignore_index=True))
            if not out.empty:
                yield out

    local = df.mapInPandas(local_skyline, schema)
    # global pass over the candidate union — one partition, one sweep;
    # exact frontier regardless of how phase 1 was partitioned
    return local.coalesce(1).mapInPandas(global_skyline, schema).select(*cols)
