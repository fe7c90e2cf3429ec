"""Engine-portable deterministic hashing.

The dedup / fingerprint / LSH operators need hash functions that are (a)
computable as native Spark Column expressions (JVM-side, codegen'd — no
Python UDFs in the hot path) and (b) reproducible in ANSI-ish SQL so a
DuckDB oracle can verify results value-for-value.

Base hash: the first 15 hex digits of md5 interpreted as a 60-bit integer.
    Spark :  conv(substring(md5(x), 1, 15), 16, 10)  → cast long
    DuckDB:  CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
Both engines implement md5 bit-identically, so every derived hash family
(minhash permutations, simhash planes, band keys) matches across engines.

Scale note: md5 is ~2-3× slower than xxhash64, but it is the only keyed-hash
primitive both engines share. Operators take a `hash_fn` seam so a pure-Spark
deployment can swap in `F.xxhash64` without touching operator logic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^61 - 1, a Mersenne prime: (a*h + b) mod P is a universal hash family and
# both engines compute it exactly in int64/int128-free range because
# a, h < 2^31 keeps a*h < 2^62 ... we instead keep a,b < 2^20 and h < 2^40
# to stay overflow-safe in signed 64-bit on both sides.
MERSENNE_P = (1 << 61) - 1

# Truncation widths: base hash uses 10 hex digits (40 bits) so that
# a (< 2^20) * h (< 2^40) < 2^60 never overflows a signed 64-bit int in
# either engine — DuckDB raises on BIGINT overflow, Spark wraps silently;
# staying under 2^62 keeps the two engines identical.
_BASE_HEX_DIGITS = 10


def md5_long(col: Column | str) -> Column:
    """40-bit integer hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, _BASE_HEX_DIGITS), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """Same 40-bit hash in DuckDB SQL, for oracle queries."""
    return f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, {_BASE_HEX_DIGITS}) AS BIGINT)"


def _perm_params(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for n universal-hash permutations.

    Derived from a fixed linear recurrence (no RNG state, so Spark and the
    SQL oracle generate literally identical constants).
    """
    params = []
    a, b = seed * 2 + 1, seed * 7 + 3
    for _ in range(n):
        a = (a * 1_103_515_245 + 12_345) % (1 << 20) | 1  # odd, < 2^20
        b = (b * 69_069 + 1) % (1 << 20)
        params.append((a, b))
    return params


def minhash_value(base: Column, a: int, b: int) -> Column:
    """One permuted hash value h_i(x) = (a*base + b) mod P (Spark side)."""
    return (base * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)


def minhash_value_sql(base_expr: str, a: int, b: int) -> str:
    return f"(({base_expr}) * {a} + {b}) % {MERSENNE_P}"
