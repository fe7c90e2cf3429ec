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
        # the global pass must compare EVERY candidate against every
        # earlier survivor: Arrow hands the coalesced partition over in
        # maxRecordsPerBatch (default 10k) chunks, and an independent
        # per-batch sweep would never compare a batch-2 row against the
        # batch-1 row that dominates it (round-11 review catch, pinned by
        # test_pareto_frontier_many_candidates). Rather than concat the
        # whole candidate union (ADVICE r11: unbounded on adversarial
        # anti-correlated data), each batch FOLDS into a running frontier:
        # sweep(frontier ∪ batch) — exact because strict-Pareto dominance
        # is transitive, so discarding a dominated row never discards a
        # dominator some later row needed (the skyline fold is confluent;
        # same argument as streaming/frontier's monotone fold). Memory is
        # bounded by the TRUE frontier size + one Arrow batch — the
        # all-non-dominated worst case is the output itself, pinned by
        # test_pareto_frontier_anticorrelated_bounded_batches.
        running = None
        for pdf in batches:
            part = sweep(pdf)
            if part.empty:
                continue
            running = (
                part
                if running is None
                else sweep(pd.concat([running, part], ignore_index=True))
            )
        if running is not None and not running.empty:
            yield running

    local = df.mapInPandas(local_skyline, schema)
    # global pass over the candidate union — one partition, one sweep;
    # exact frontier regardless of how phase 1 was partitioned
    return local.coalesce(1).mapInPandas(global_skyline, schema).select(*cols)
