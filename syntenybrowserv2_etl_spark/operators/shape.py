"""Shape-changing operators: SURVEY §2.4 X1-X4 (X5-X7 live in sources/io.py).

All are pure DataFrame compositions — union/explode/select — that Catalyst
plans without any shuffle except where semantically required (none of these
need one: explode and union are narrow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_children(
    df: DataFrame, parent_type: str, child_type: str, type_col: str, parent_attr_col: str
) -> tuple[DataFrame, DataFrame]:
    """X1 — split a flat GFF3 read into parent rows and child rows.

    Reference: src/import_genes_exons.py:127-136 walks BCBio's nested
    record tree and emits exon rows carrying ``parent_gene``. In the flat
    9-column representation the hierarchy is already relational: children
    are rows whose ``type`` is the child type and whose ``Parent`` attribute
    is the FK — no recursion, no explode, two filters over one scan.
    """
    parents = df.filter(F.col(type_col) == parent_type)
    children = df.filter(F.col(type_col) == child_type).withColumn(
        "parent_gene", F.col(parent_attr_col)
    )
    return parents, children


def explode_delimited(df: DataFrame, col: str, out_col: str, sep: str = ",") -> DataFrame:
    """X2 — one row per element of a delimited string column.

    Reference: src/import_variants.py:80-82 (one output row per gene in
    VCF INFO['CG']). Narrow op: no shuffle.
    """
    return df.withColumn(out_col, F.explode(F.split(F.col(col), sep)))


def symmetric_union(df: DataFrame, swap: dict[str, str]) -> DataFrame:
    """X3 — emit every row twice with roles swapped: (ref,comp) ∪ (comp,ref).

    Reference: src/import_homologs.py:134-142, src/import_synteny_blocks.py:
    100-115 insert each record forward and reversed. ``swap`` maps each
    column to its role-partner (id ↔ partner id); unmapped columns pass
    through. unionByName of two projections of the same scan — Catalyst
    reuses the exchange; no shuffle.
    """
    inverse = {v: k for k, v in swap.items()}
    full_swap = {**swap, **inverse}
    swapped = df.select(
        *[F.col(full_swap.get(c, c)).alias(c) for c in df.columns]
    )
    return df.unionByName(swapped)


def accumulate(dfs: list[DataFrame]) -> DataFrame:
    """X4 — multi-file / multi-species accumulation into one table.

    Reference: sequential appends into one SQLite table
    (create_database.sh:16-18). unionByName keeps per-source lineage
    parallel — each input stays its own set of scan tasks.
    """
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
