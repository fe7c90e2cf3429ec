"""Skew-mitigation join strategies.

AQE's skew-join splitting (enabled in session.py) handles most hot keys at
runtime by splitting oversized shuffle partitions. This module covers the
case AQE cannot fix: a SINGLE join key so hot that even a split partition
still pairs every fact row of that key against the same dim row copy — the
classic mega-chromosome / null-key / stopword-token problem.

``salted_join`` pre-shards the fact side into ``salt_buckets`` deterministic
sub-keys and replicates the (small) dim side once per bucket, so the hot key
spreads over ``salt_buckets`` reducers. Replication cost: |dim| ×
salt_buckets rows — use only when dim is broadcast-scale but the join must
shuffle anyway (e.g. dim too big to broadcast whole, or co-partitioned
output needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted across ``salt_buckets`` shards.

    The salt is a deterministic hash of the whole fact row (xxhash64 — no
    RNG, reruns partition identically), so rows of one hot key scatter
    uniformly. The dim side explodes ×salt_buckets; every fact row still
    meets exactly one copy of its dim row, so results equal the plain join
    for inner/left joins.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join replicates the right side; '{how}' joins would "
            "multiply right-side rows — use a plain join"
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets)
    ).cast("int")
    fact_s = fact.withColumn("__salt", salt)
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return fact_s.join(dim_s, on + ["__salt"], how).drop("__salt")
