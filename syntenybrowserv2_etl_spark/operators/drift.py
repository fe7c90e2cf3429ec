"""Corpus distribution drift: smoothed unigram KL divergence with per-token
attribution.

Continuous ingestion needs a tripwire for "this week's crawl no longer
looks like the reference corpus" BEFORE a model trains on it. The
token-level analogue of the CUSUM mean-shift detector (timeseries.py):
compare the unigram distribution of a candidate slice P against a
reference slice Q,

    KL(P ‖ Q) = Σ_t p(t) · ln(p(t) / q(t))

with add-one smoothing over the UNION vocabulary (so a token unseen in Q
contributes a large-but-finite term instead of ∞, and the measure is
defined for any pair of slices). The per-token contributions double as
drift ATTRIBUTION — the tokens most over-represented in P.

Scale shape: tokenize → one groupBy(token) per side (map-side
combinable, the only row-scans) → full-outer join of two vocab-sized
frames → three scalar aggregates broadcast back. Never materializes a
pairs structure; everything after the counts is vocabulary-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _tokens


def _token_counts(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(_tokens(F.col(text_col))).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def unigram_kl(
    df_p: DataFrame,
    df_q: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """Smoothed unigram KL(P‖Q) between two corpus slices, with the
    ``top_k`` highest-contribution tokens as attribution rows. Returns
    ``(token, p R8, q R8, contrib R8, kl_total R6)`` — ``kl_total`` is
    the divergence over the FULL vocabulary (identical on every row),
    the token rows are the top slice of it (ordered contrib DESC, token
    ASC — deterministic under ties).
    """
    cp = _token_counts(df_p, text_col)
    cq = _token_counts(df_q, text_col)
    vocab = (
        cp.withColumnRenamed("c", "cp")
        .join(cq.withColumnRenamed("c", "cq"), "token", "full_outer")
        .select(
            "token",
            F.coalesce("cp", F.lit(0)).alias("cp"),
            F.coalesce("cq", F.lit(0)).alias("cq"),
        )
    )
    totals = vocab.agg(
        F.sum("cp").alias("tp"),
        F.sum("cq").alias("tq"),
        F.count(F.lit(1)).alias("v"),
    )
    scored = vocab.crossJoin(F.broadcast(totals)).select(
        "token",
        ((F.col("cp") + 1) / (F.col("tp") + F.col("v"))).alias("p"),
        ((F.col("cq") + 1) / (F.col("tq") + F.col("v"))).alias("q"),
    )
    scored = scored.withColumn(
        "contrib", F.col("p") * F.log(F.col("p") / F.col("q"))
    )
    # both outputs (total KL + top-k attribution) branch off `scored`;
    # without a lineage cut Spark would recompute the whole token scan
    # per branch — a second full corpus pass at scale. The checkpoint
    # materializes the VOCAB-sized frame once (lazy: on first action).
    scored = scored.localCheckpoint(eager=False)
    kl = scored.agg(F.round(F.sum("contrib"), 6).alias("kl_total"))
    return (
        scored.orderBy(F.col("contrib").desc(), F.col("token").asc())
        .limit(top_k)
        .crossJoin(F.broadcast(kl))
        .select(
            "token",
            F.round("p", 8).alias("p"),
            F.round("q", 8).alias("q"),
            F.round("contrib", 8).alias("contrib"),
            "kl_total",
        )
    )
