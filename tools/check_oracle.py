"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, compares row count, sorted column names, and
order-insensitive values.

Round-1 lesson: the driver's value-hash is REPRESENTATION-sensitive — three
queries that value-matched under a %.9g/isoformat canonicalizer still
hash-mismatched (raw timestamps, DuckDB HUGEINT sums, rounded-double repr
drift). So this checker now compares raw representations: floats via
``repr`` (shortest round-trip — any cross-engine ulp/exponent difference
shows), timestamps via their epoch-ns integer, and it WARNS on output
columns whose type is hash-risky (timestamp / unrounded float / non-int64
integer) even when values match. Queries should emit integers, strings,
booleans, and lattice-encoded doubles only.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = df[cols].copy()
    rows = []
    for row in out.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, pd.Timestamp):
                vals.append(str(v.value))  # epoch ns — resolution-proof
            elif isinstance(v, float):
                vals.append(repr(v))  # shortest round-trip, ulp-strict
            elif hasattr(v, "item"):
                vals.append(repr(v.item()))
            else:
                vals.append(str(v))
        rows.append(tuple(vals))
    return sorted(rows)


# dtype kinds that have bitten the driver hash before: raw timestamps (µs
# vs ns serialization), object columns (DuckDB HUGEINT), plain floats that
# aren't lattice-encoded (repr drift). 'f' is only a warning because many
# queries ROUND(...) and those have hashed fine — but new queries should
# prefer the integer lattice.
def risky_cols(df: pd.DataFrame) -> list[str]:
    out = []
    for c in df.columns:
        k = df[c].dtype.kind
        if k == "M":
            out.append(f"{c}:timestamp")
        elif k == "O" and df[c].map(
            lambda v: isinstance(v, int) and not isinstance(v, bool)
        ).any():
            out.append(f"{c}:int-as-object")  # DuckDB HUGEINT lands here
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod
    from syntenybrowserv2_etl_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"row count {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            a, b = canon(sdf), canon(odf)
            if a != b:
                diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                detail = "; ".join(f"row{i}: {a[i]} vs {b[i]}" for i in diff)
                problems.append(f"values differ ({detail})")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {' | '.join(problems)}")
        else:
            warn = risky_cols(sdf) + [
                f"oracle:{w}" for w in risky_cols(odf) if w not in risky_cols(sdf)
            ]
            note = f"  [hash-risk: {', '.join(warn)}]" if warn else ""
            print(f"ok   {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s){note}")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
