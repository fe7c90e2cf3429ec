"""Categorical-association audit: mutual information, chi-square, and
Cramér's V between two metadata columns.

A curation pipeline that caps domains, mixes sources, and filters by
quality needs to KNOW when two metadata axes are confounded — e.g. "is
`lang` independent of `source`?" If quality scores correlate with
source, a per-source cap silently shifts the language mix. The standard
audit statistics over the contingency table of (x, y):

    MI(X;Y)  = Σ_xy p(xy) · ln( p(xy) / (p(x)·p(y)) )        [nats]
    χ²       = Σ_xy (o_xy − e_xy)² / e_xy,  e_xy = r_x·c_y/n
    V        = sqrt( χ² / (n · (min(R,C) − 1)) )              [0..1]
    NMI      = MI / sqrt(H(X)·H(Y))                           [0..1]

Scale shape: ONE row scan (the groupBy(x, y) cell counts — map-side
combinable); everything after is category-sized. MI needs no join at
all via the identity

    MI = ln n + ( Σ o·ln o − Σ_x r·ln r − Σ_y c·ln c ) / n,

and χ² avoids enumerating ZERO cells (whose (o−e)²/e = e terms sum to
n − Σ_observed e) via the equivalent observed-cells-only identity

    χ² = n · ( Σ_observed o² / (r_x·c_y) − 1 ),

so the plan is: cells → two category-sized marginal frames → two
equi-joins (cells⋈r on x, ⋈c on y) for the χ² term → four 1-row scalar
aggregates combined by broadcast cross joins. Never a pairs structure,
never a full R×C grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def categorical_association(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """One-row association report between two categorical columns:
    ``(n, r_cats, c_cats, mi R6, nmi R6, chi2 R4, cramers_v R6)``.

    All statistics are exact (integer counts → IEEE doubles in a fixed
    formula — both engines compute identical values before rounding).
    ``nmi``/``cramers_v`` are NULL when a side is constant (min(R,C)=1
    or zero entropy), mirroring the undefined denominators rather than
    inventing a 0.
    """
    cells = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rx = cells.groupBy("x").agg(F.sum("o").alias("r"))
    cy = cells.groupBy("y").agg(F.sum("o").alias("c"))

    # χ² term: per observed cell o²/(r·c) — two category-sized equi-joins.
    chi = (
        cells.join(rx, "x")
        .join(cy, "y")
        .agg(
            F.sum(
                F.col("o").cast("double") * F.col("o")
                / (F.col("r").cast("double") * F.col("c"))
            ).alias("s_chi")
        )
    )
    a_cell = cells.agg(
        F.sum(F.col("o") * F.log("o")).alias("s_o"),
        F.sum("o").alias("n"),
    )
    a_r = rx.agg(
        F.sum(F.col("r") * F.log("r")).alias("s_r"),
        F.count(F.lit(1)).alias("r_cats"),
    )
    a_c = cy.agg(
        F.sum(F.col("c") * F.log("c")).alias("s_c"),
        F.count(F.lit(1)).alias("c_cats"),
    )
    one = (
        a_cell.crossJoin(F.broadcast(a_r))
        .crossJoin(F.broadcast(a_c))
        .crossJoin(F.broadcast(chi))
    )
    n = F.col("n").cast("double")
    mi = F.log("n") + (F.col("s_o") - F.col("s_r") - F.col("s_c")) / n
    hx = F.log("n") - F.col("s_r") / n
    hy = F.log("n") - F.col("s_c") / n
    chi2 = n * (F.col("s_chi") - F.lit(1.0))
    min_rc = F.least("r_cats", "c_cats")
    return one.select(
        F.col("n").cast("long").alias("n"),
        F.col("r_cats").cast("long").alias("r_cats"),
        F.col("c_cats").cast("long").alias("c_cats"),
        F.round(mi, 6).alias("mi"),
        F.round(
            F.when(hx * hy > 0, mi / F.sqrt(hx * hy)), 6
        ).alias("nmi"),
        F.round(chi2, 4).alias("chi2"),
        F.round(
            F.when(min_rc > 1, F.sqrt(F.greatest(chi2, F.lit(0.0)) / (n * (min_rc - 1)))),
            6,
        ).alias("cramers_v"),
    )
