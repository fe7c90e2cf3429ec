"""Model-evaluation primitives over scored corpora: exact ROC-AUC via the
rank-sum identity, and calibration (reliability) bins.

A training-data pipeline that gates documents on a learned quality score
(the q87 fastText-style classifier shape) needs to EVALUATE that scorer
against labels at corpus scale. The naive AUC — compare every
positive/negative pair — is a quadratic join; the Mann-Whitney rank-sum
identity computes it exactly from per-score counts:

    U   = Σ_s [ neg_below(s) · pos_at(s) + ½ · pos_at(s) · neg_at(s) ]
    AUC = U / (P · N)

where ``neg_below(s)`` is the running count of negatives with strictly
smaller score, and the ½-term is the standard mid-rank tie treatment.

Scale shape: one groupBy(score) — map-side combinable, the only pass over
the rows — then one ordered cumulative window over the DISTINCT scores.
The window is a single partition by necessity (a global rank is a global
order), but its input is score CARDINALITY, not row count: a billion-row
corpus with float scores still reduces to ≤ a few million distinct
values, and a quantized/score-bucketed scorer to far fewer. Never a
pairs join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def roc_auc(
    df: DataFrame,
    score_col: Column | str,
    label_col: Column | str,
    score_bins: int | None = None,
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` (higher ⇒ predicted positive)
    against boolean ``label_col``. Returns one row:
    ``(auc double ROUND 6, n_pos long, n_neg long)``. Rows with a NULL
    score or label are dropped (undefined in the ranking).

    The cumulative window's input is the DISTINCT-score frame — score
    CARDINALITY, never rows. For a raw high-precision double scorer the
    distinct count can approach the row count; ``score_bins=N`` closes
    that adversarial case by quantizing scores into N equal-width bins
    over the observed [min, max] BEFORE the rank-sum (one extra
    single-row min/max aggregate, broadcast), bounding the window input
    at N regardless of scorer precision.

    Binning error is exactly characterizable: quantization only changes
    the contribution of (pos, neg) pairs that land in the SAME bin —
    each moves from {0, ½, 1} to ½ — so

        |auc_binned − auc_exact| ≤ Σ_b pos_b·neg_b / (P·N) / 2

    and the binned variant RETURNS that bound as ``auc_err_bound``
    (double ROUND 6), computed from the same per-bin counts for free.
    Monotone scorers with spread-out scores make it ~1/score_bins;
    degenerate scorers (everything in one bin) honestly report ~0.5.
    """
    s, y = _as_col(score_col), _as_col(label_col)
    clean = df.filter(s.isNotNull() & y.isNotNull())
    if score_bins is not None:
        rng = clean.agg(
            F.min(s).alias("__lo"), F.max(s).alias("__hi")
        )
        clean = clean.crossJoin(F.broadcast(rng))
        s = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
            F.least(
                F.floor(
                    (s - F.col("__lo"))
                    / (F.col("__hi") - F.col("__lo"))
                    * score_bins
                ),
                F.lit(score_bins - 1),
            )
        ).cast("long")
    by_score = clean.groupBy(s.alias("__s")).agg(
        F.sum(F.when(y, 1).otherwise(0)).alias("pos"),
        F.sum(F.when(y, 0).otherwise(1)).alias("neg"),
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    u_terms = by_score.withColumn(
        "neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0))
    )
    agg = u_terms.agg(
        F.sum(
            F.col("neg_below") * F.col("pos")
            + F.lit(0.5) * F.col("pos") * F.col("neg")
        ).alias("u"),
        F.sum(F.col("pos") * F.col("neg")).alias("__same_bin_pairs"),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
    )
    out = [
        F.round(F.col("u") / (F.col("n_pos") * F.col("n_neg")), 6).alias("auc"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
    ]
    if score_bins is not None:
        out.insert(
            1,
            F.round(
                F.col("__same_bin_pairs")
                / (F.col("n_pos") * F.col("n_neg"))
                / 2,
                6,
            ).alias("auc_err_bound"),
        )
    return agg.select(*out)


def calibration_bins(
    df: DataFrame,
    score_col: Column | str,
    label_col: Column | str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a score in [0, 1]: equal-width bins,
    per bin the count, mean score, and empirical positive rate — a
    well-calibrated scorer has mean_score ≈ pos_rate per bin. One
    aggregation, no window. Returns
    ``(bin int, n long, mean_score double R6, pos_rate double R6)``.
    """
    s, y = _as_col(score_col), _as_col(label_col)
    b = F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).cast("int")
    return (
        df.filter(s.isNotNull() & y.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(s), 6).alias("mean_score"),
            F.round(F.avg(F.when(y, 1.0).otherwise(0.0)), 6).alias("pos_rate"),
        )
    )


def cohens_kappa(
    df: DataFrame, truth_col: Column | str, pred_col: Column | str
) -> DataFrame:
    """Cohen's kappa — agreement between two categorical labelings
    corrected for chance:

        κ = (p_o − p_e) / (1 − p_e),
        p_o = Σ diag / n,     p_e = Σ_k (row_k · col_k) / n²

    The label-quality primitive (classifier vs truth, or two annotators).
    Scale shape: one groupBy per marginal plus one pass for the diagonal
    — category-cardinality frames joined full-outer, never a pairs
    structure. Every sum is an integer (exact in doubles to 2^53), so
    both engines compute identical κ before the ROUND. Returns one row
    ``(kappa R6, accuracy R6, n long)``.
    """
    t, p = _as_col(truth_col), _as_col(pred_col)
    lab = df.filter(t.isNotNull() & p.isNotNull()).select(
        t.alias("__t"), p.alias("__p")
    )
    base = lab.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("__t") == F.col("__p"), 1).otherwise(0)).alias(
            "diag"
        ),
    )
    rows = lab.groupBy(F.col("__p").alias("cat")).agg(
        F.count(F.lit(1)).alias("rp")
    )
    cols = lab.groupBy(F.col("__t").alias("cat")).agg(
        F.count(F.lit(1)).alias("cp")
    )
    cross = (
        rows.join(cols, "cat", "full_outer")
        .agg(
            F.sum(
                F.coalesce("rp", F.lit(0)) * F.coalesce("cp", F.lit(0))
            ).alias("rc")
        )
    )
    return (
        base.crossJoin(F.broadcast(cross))
        .select(
            F.round(
                (
                    F.col("diag") / F.col("n")
                    - F.col("rc") / (F.col("n") * F.col("n"))
                )
                / (F.lit(1.0) - F.col("rc") / (F.col("n") * F.col("n"))),
                6,
            ).alias("kappa"),
            F.round(F.col("diag") / F.col("n"), 6).alias("accuracy"),
            F.col("n").cast("long").alias("n"),
        )
    )
