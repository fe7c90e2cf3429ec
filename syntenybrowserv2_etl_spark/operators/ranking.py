"""Rank fusion for hybrid retrieval: Reciprocal Rank Fusion (RRF).

Hybrid search pipelines score candidates under SEVERAL signals (BM25
lexical, embedding cosine, recency, quality) whose raw scales are
incomparable; RRF (Cormack/Clarke/Büttcher, SIGIR'09) fuses the RANKINGS
instead of the scores:

    rrf(item) = Σ_r 1 / (k + rank_r(item))        (k = 60 conventionally)

Scale shape: ranks come from ``row_number`` windows. A window needs a
partition to avoid a single-task global sort, and retrieval fusion has a
natural one — the QUERY (fuse each query's candidate list, thousands of
rows, independently). ``partition_cols`` is therefore required in spirit:
passing none is accepted for small frames but documents itself as the
single-partition plan it is. Ties break deterministically on the id
columns so fused output is reproducible across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    df: DataFrame,
    id_cols: list[str],
    score_cols: list[str],
    k: int = 60,
    partition_cols: list[str] | None = None,
    top_n: int | None = None,
) -> DataFrame:
    """Fuse the rankings induced by each of ``score_cols`` (higher score =
    better = rank 1) into an RRF score per row. Adds one ``rank_<col>``
    per signal and ``rrf (double ROUND 8)``; with ``top_n``, keeps the
    top rows per partition by (rrf DESC, id ASC) — deterministic under
    ties because every rank itself tie-breaks on ``id_cols``.
    """
    parts = [F.col(c) for c in (partition_cols or [])]
    out = df
    rank_names = []
    for c in score_cols:
        w = Window.partitionBy(*parts).orderBy(
            F.col(c).desc(), *[F.col(i).asc() for i in id_cols]
        )
        rn = f"rank_{c}"
        rank_names.append(rn)
        out = out.withColumn(rn, F.row_number().over(w))
    rrf = None
    for rn in rank_names:
        term = F.lit(1.0) / (F.lit(k) + F.col(rn))
        rrf = term if rrf is None else rrf + term
    out = out.withColumn("rrf", F.round(rrf, 8))
    if top_n is not None:
        w = Window.partitionBy(*parts).orderBy(
            F.col("rrf").desc(), *[F.col(i).asc() for i in id_cols]
        )
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= top_n)
            .drop("__rn")
        )
    return out


def retrieval_metrics(
    df: DataFrame,
    query_col: str,
    id_col: str,
    score_col: str,
    rel_col: Column | str,
    k: int = 10,
) -> DataFrame:
    """Per-query retrieval evaluation at cutoff ``k``: precision@k,
    recall@k, and nDCG@k of the ranking induced by ``score_col`` (higher
    = better; ties break deterministically on ``id_col`` ASC) against the
    relevance grades in ``rel_col`` (binary or graded, ≥ 0) — the
    counterpart of ``rrf_fuse`` on the other side of the loop: fuse with
    RRF, then MEASURE the fused ranking against labels.

    DCG uses the linear-gain form Σ rel_i / log2(i + 1) over the top-k
    ranks; IDCG ranks the SAME query's grades descending (so nDCG@k = 1
    means "the best achievable ordering of what this query actually
    has"). Zero-relevance queries report 0.0 for all three (not NULL —
    a scorer can't be rewarded or faulted there, and means stay simple).

    Returns one row per query:
    ``(query, n_rel long, p_at_k double R6, recall_at_k double R6,
    ndcg_at_k double R6, rr_at_k double R6)`` — ``rr_at_k`` is the
    reciprocal rank of the FIRST relevant result within the top k (0.0
    when none lands there); its mean over queries is MRR@k.

    Scale shape: two row_number windows partitioned by query (score
    ranking + ideal-grade ranking — Spark plans the top-k filters as
    WindowGroupLimit, so map tasks pre-prune to k per query) and one
    query-keyed aggregation that reuses the window's partitioning. No
    global sort, no UDFs; cost is one shuffle on the query key.
    """
    rel = (F.col(rel_col) if isinstance(rel_col, str) else rel_col).cast(
        "double"
    )
    base = df.select(
        F.col(query_col).alias("__q"),
        F.col(id_col).alias("__id"),
        F.col(score_col).alias("__s"),
        rel.alias("__rel"),
    )
    w_score = Window.partitionBy("__q").orderBy(
        F.col("__s").desc(), F.col("__id").asc()
    )
    w_ideal = Window.partitionBy("__q").orderBy(
        F.col("__rel").desc(), F.col("__id").asc()
    )
    ranked = base.withColumn("__r", F.row_number().over(w_score)).withColumn(
        "__ri", F.row_number().over(w_ideal)
    )
    log2 = F.log2
    agg = ranked.groupBy(F.col("__q").alias(query_col)).agg(
        F.sum(F.when(F.col("__rel") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_rel"),
        F.sum(
            F.when((F.col("__r") <= k) & (F.col("__rel") > 0), 1).otherwise(0)
        ).alias("__hits"),
        F.sum(
            F.when(
                F.col("__r") <= k, F.col("__rel") / log2(F.col("__r") + 1)
            ).otherwise(0.0)
        ).alias("__dcg"),
        F.sum(
            F.when(
                F.col("__ri") <= k, F.col("__rel") / log2(F.col("__ri") + 1)
            ).otherwise(0.0)
        ).alias("__idcg"),
        F.min(
            F.when((F.col("__r") <= k) & (F.col("__rel") > 0), F.col("__r"))
        ).alias("__first_rel"),
    )
    return agg.select(
        query_col,
        "n_rel",
        F.round(F.col("__hits") / k, 6).alias("p_at_k"),
        F.round(
            F.when(F.col("n_rel") > 0, F.col("__hits") / F.col("n_rel"))
            .otherwise(0.0),
            6,
        ).alias("recall_at_k"),
        F.round(
            F.when(F.col("__idcg") > 0, F.col("__dcg") / F.col("__idcg"))
            .otherwise(0.0),
            6,
        ).alias("ndcg_at_k"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("__first_rel"), F.lit(0.0)), 6
        ).alias("rr_at_k"),
    )
