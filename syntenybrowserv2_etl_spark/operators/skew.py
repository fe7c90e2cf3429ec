"""Skew-defeating join strategies.

AQE's skew-join handles sort-merge skew after the fact by splitting
oversized partitions; salting handles it BY CONSTRUCTION when a known-hot
equi-join key (the head of a Zipfian domain distribution, the NULL bucket,
a boilerplate dedup key) would otherwise pin one reducer. The engine uses
salting where the skew is structural and predictable, AQE where it is
data-dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salt_buckets: int = 8,
    how: str = "inner",
    tiebreaker: str | Column | None = None,
) -> DataFrame:
    """Equi-join where the BIG side's key distribution is heavily skewed.

    Each big-side row gets a salt in [0, salt_buckets); the small side is
    replicated ``salt_buckets``× (explode of a literal sequence — its rows
    are few by assumption). The join key becomes (*on, salt), so a hot
    key's rows spread across ``salt_buckets`` reducers instead of one.
    Results are IDENTICAL to the plain join for any salt assignment — the
    salt only routes rows — so the unsalted query is the oracle. The salt
    is ``xxhash64`` over the big side's full row, modulo buckets: a
    genuinely deterministic per-row value, so reruns route and partition
    identically (the repo's reproducibility posture), unlike
    ``monotonically_increasing_id`` which depends on partition layout.
    Caveat: rows identical in EVERY column share a bucket, so a hot key
    made of literal duplicate rows will not spread on its own — that skew
    shape is common in raw corpora. Pass ``tiebreaker`` to fold a
    distinguishing expression into the salt hash: an upstream unique id
    if one exists outside the joined columns' values, or an explicitly
    layout-dependent one (``F.spark_partition_id()``,
    ``F.monotonically_increasing_id()``) when rows are true byte-clones —
    result rows are identical for ANY salt assignment (the salt only
    routes), so layout-dependence costs reproducibility of the physical
    routing only, never of the output.

    ``how``: inner or left only. A right/full join is semantically wrong
    under salting — a small-side key with no match would surface once PER
    SALT — so those raise instead of silently duplicating.

    Cost model: small side ×salt_buckets (broadcast-sized by assumption),
    big side unchanged; reducer max load drops ~salt_buckets× on the hot
    key. Use when one key holds ≳ a task's worth of rows; otherwise the
    replication is pure overhead and AQE alone is the better default.
    """
    if how.replace("_", "").lower() not in ("inner", "left", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left only, not {how!r}: small-side "
            "unmatched rows would appear once per salt bucket"
        )
    keys = [on] if isinstance(on, str) else list(on)
    hash_inputs = [F.col(c) for c in big.columns]
    if tiebreaker is not None:
        hash_inputs.append(
            F.col(tiebreaker) if isinstance(tiebreaker, str) else tiebreaker
        )
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*hash_inputs), F.lit(salt_buckets))
    )
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = b.join(s, [*keys, "__salt"], how)
    return out.drop("__salt")
