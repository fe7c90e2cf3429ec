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
