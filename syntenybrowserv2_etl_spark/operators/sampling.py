"""Deterministic sampling / splitting for training-data pipelines.

``df.sample()`` is RNG-backed: resampling a 100 TB corpus after adding one
file reshuffles every row's fate, and no external system can reproduce the
subset. These operators derive each row's fate from a *content hash* of its
id (the engine-portable md5 family, functions/hashing.py), which buys:

  - reproducibility: same ids → same sample, on any cluster size, any
    partitioning, any engine (the DuckDB oracle verifies value-for-value);
  - stability under growth: adding rows never flips existing rows' fate —
    the property that keeps train/test contamination impossible across
    dataset versions;
  - zero coordination: a pure row-local predicate/projection — no shuffle,
    no RNG state, pushes down to the scan.

All fates are computed on a fixed-denominator integer lattice
(``_DENOM = 1_000_000``) rather than float compare, so Spark and SQL agree
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing
from ..functions.transforms import fan_out

_DENOM = 1_000_000


def _fate(id_col, seed: int):
    """Row fate in [0, _DENOM): hash of "<id>:<seed>".

    Salting with the seed means independent samples (different seeds) are
    uncorrelated — the standard way to draw k disjoint-by-construction or
    overlapping-by-design subsets from one corpus.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return hashing.md5_long(F.concat_ws(":", c.cast("string"), F.lit(str(seed)))) % _DENOM


def _fate_sql(id_expr: str, seed: int) -> str:
    h = hashing.md5_long_sql(f"CAST({id_expr} AS VARCHAR) || ':' || '{seed}'")
    return f"{h} % {_DENOM}"


def hash_sample(df: DataFrame, id_col: str, fraction: float, seed: int = 42) -> DataFrame:
    """Keep ~fraction of rows, chosen by id hash. Row-local; scan-pushable."""
    return df.filter(_fate(id_col, seed) < int(fraction * _DENOM))


def train_test_split(
    df: DataFrame, id_col: str, test_fraction: float = 0.1, seed: int = 42
) -> DataFrame:
    """Stamp a ``split`` column: 'test' for the hash-lowest ``test_fraction``.

    Disjoint and exhaustive by construction; membership of a given id never
    changes as the corpus grows (contamination-proof across versions).
    """
    fate = _fate(id_col, seed)
    return df.withColumn(
        "split",
        F.when(fate < int(test_fraction * _DENOM), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant languages).

    The fraction table is a literal map baked into the predicate — no join,
    no broadcast, row-local like the flat sampler. Strata missing from
    ``fractions`` get ``default_fraction``.
    """
    thr = F.create_map(
        *[
            x
            for k, v in fractions.items()
            for x in (F.lit(k), F.lit(int(v * _DENOM)))
        ]
    )
    threshold = F.coalesce(
        thr[F.col(strata_col)], F.lit(int(default_fraction * _DENOM))
    )
    return df.filter(_fate(id_col, seed) < threshold)


def deterministic_shuffle(
    df: DataFrame, id_col: str, n_shards: int, seed: int = 42
) -> DataFrame:
    """Reproducible training-order shuffle + shard assignment.

    A training run needs the corpus in a pseudo-random order that is (a)
    uncorrelated with ingest order, (b) bit-reproducible across runs,
    cluster sizes, and engines, and (c) addressable (shard s, position p →
    one specific example). RNG-backed ``orderBy(rand())`` fails all three;
    a single global ``orderBy(hash)`` is a full-corpus total sort whose
    final stage bottlenecks on one range boundary at 100 TB.

    Here each row's shard is ``md5(seed:id) % n_shards`` (row-local,
    scan-pushable) and its position is the rank of that same hash WITHIN
    the shard (ties broken by id, so byte-equal rows can't flip order).
    One hash-partition shuffle on the shard key + a per-shard local sort —
    the physical plan a sharded training-data writer wants anyway
    (``partitionBy(shard)``), with no global ordering stage. Hash order
    within a shard is uniform over ids, so concatenating shards 0..n-1 is
    a valid global shuffle of the corpus.

    Output: input columns + (shard: long, pos: long), pos 1-based within
    shard in hash order. Raises if the input already carries a ``shard``,
    ``pos``, or ``__h`` column — silently overwriting a caller's column
    with an unrelated meaning is how training orders go quietly wrong.
    """
    from pyspark.sql import Window

    clash = {"shard", "pos", "__h"}.intersection(df.columns)
    if clash:
        raise ValueError(
            f"deterministic_shuffle would overwrite existing column(s) "
            f"{sorted(clash)}; rename them before calling"
        )
    h = hashing.md5_long(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    out = df.withColumn("__h", h).withColumn(
        "shard", (F.col("__h") % n_shards).cast("long")
    )
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    return out.withColumn("pos", F.row_number().over(w).cast("long")).drop("__h")


def cap_per_group(
    df: DataFrame, id_col: str, group_col: str, cap: int, seed: int = 42
) -> DataFrame:
    """Deterministic per-group row cap — the "max N pages per domain" rule
    of web-corpus curation (CCNet/RefinedWeb-style domain balancing).

    Each row ranks within its group by (salted id-hash, id): an unbiased,
    RNG-free draw whose membership for a given id set never changes across
    runs or engines. Rows with rank > cap drop.

    Scale shape: the rank-≤-cap filter plans as WindowGroupLimit — every
    map task pre-prunes to its local top-``cap`` per group BEFORE the
    exchange, so a mega-domain ships O(tasks·cap) rows to the window,
    never its full row set; the groups-keyed shuffle otherwise skew-proof
    by the same pruning. This beats sampling by fraction (needs a per-group
    count first) and beats groupBy+collect_list (materializes whole groups
    on single tasks).

    Output: input columns + ``rk`` (1-based kept rank within the group).
    """
    if "rk" in df.columns:
        raise ValueError("cap_per_group would overwrite existing 'rk' column")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        _fate(id_col, seed).asc(), F.col(id_col).asc()
    )
    return df.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= cap
    )


def dsir_importance(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target,
    n_buckets: int = 256,
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much its hashed-bigram distribution looks like a TARGET domain
    relative to the RAW corpus, then keep the top of the ranking (or
    resample proportionally) to tilt the training mix toward the target.

    ``target`` is a boolean Column predicate selecting the target-domain
    rows WITHIN ``df`` (e.g. ``F.col("source") == "wiki"``); the raw
    distribution is the whole input.

    Pipeline (all built-in Column ops, zero UDFs):
      1. tokenize once (shared normalized split), build word bigrams
         row-locally, hash each into one of ``n_buckets`` buckets with the
         engine-portable md5 hash;
      2. two partial-agg'd groupBys produce the raw and target bucket
         histograms — at most ``n_buckets`` rows each, REGARDLESS of
         corpus size, so the log-ratio table
         lr[b] = ln p_target(b) - ln p_raw(b)   (add-alpha smoothed)
         is a broadcast-sized dimension;
      3. each document's weight is the mean lr over its bigram
         occurrences — the bucket join broadcasts (AQE sees n_buckets
         rows), so the token stream shuffles exactly once, on doc id,
         carrying one (id, lr) row per bigram.

    At 100 TB the histogram stays n_buckets rows (DSIR production uses
    1e4); the only data-sized exchanges are the two histogram partial
    aggregations (map-side combined to n_buckets rows per task) and the
    per-doc mean. Weight is rounded to 4 decimals (AVG summation-order
    contract, same class as unigram_logprob).

    Output: (id, n_bigrams, weight) — weight NULL for docs with < 2
    tokens. Higher weight = more target-like.
    """
    from . import dedup

    _d, _norm, _toks = dedup.staged_tokens(fan_out(df), text_col, "ds")
    staged = _d.withColumn(
        "__ds_n",
        F.when(F.length(_norm) == 0, F.lit(0)).otherwise(F.size(_toks)).cast("long"),
    ).withColumn(
        # NULL-evaluating predicates (e.g. source == 'wiki' over NULL
        # source) must count as non-target: a bucket populated only by
        # NULL-predicate rows would otherwise SUM to NULL __ct and
        # silently drop its occurrences from every doc's mean
        "__ds_tgt",
        F.coalesce(target.cast("boolean"), F.lit(False)),
    )
    bigrams = staged.withColumn(
        "__bg",
        F.when(
            F.col("__ds_n") >= 2,
            F.transform(
                F.sequence(F.lit(1), (F.col("__ds_n") - 1).cast("int")),
                lambda i: F.concat_ws(
                    " ", F.element_at(_toks, i), F.element_at(_toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    # materialized: ``occ`` feeds BOTH the bucket histogram and the
    # per-doc scoring join; without the checkpoint the whole
    # normalize → tokenize → bigram-explode → md5 lineage executes twice
    # per run (the dedup._materialize shared-stage discipline)
    occ = dedup._materialize(
        bigrams.select(
            F.col(id_col),
            "__ds_tgt",
            F.explode("__bg").alias("__g"),
        ).withColumn("__b", hashing.md5_long(F.col("__g")) % n_buckets)
    )
    hist = occ.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__cr"),
        F.sum(F.col("__ds_tgt").cast("long")).alias("__ct"),
    )
    totals = hist.agg(
        F.sum("__cr").alias("__Nr"), F.sum("__ct").alias("__Nt")
    )  # one row
    lr = (
        hist.crossJoin(F.broadcast(totals))
        .withColumn(
            "__lr",
            (F.log(F.col("__ct") + alpha) - F.log(F.col("__Nt") + alpha * n_buckets))
            - (F.log(F.col("__cr") + alpha) - F.log(F.col("__Nr") + alpha * n_buckets)),
        )
        .select("__b", "__lr")
    )
    scored = (
        occ.join(F.broadcast(lr), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__nbg"),
            # + 0.0 collapses IEEE -0.0 to +0.0: a mean that rounds to
            # zero from below otherwise reprs as '-0.0' on one engine and
            # '0.0' on the other (observed at sf0.1)
            (F.round(F.avg("__lr"), 4) + F.lit(0.0)).alias("weight"),
        )
    )
    return (
        staged.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("__nbg", F.lit(0)).cast("long").alias("n_bigrams"),
            "weight",
        )
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight,
    n: int,
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling without replacement, A-ES style (Efraimidis &
    Spirakis 2006): every row draws a deterministic pseudo-uniform
    u ∈ (0, 1] from its id hash; ranking rows by u^(1/w) descending is a
    true weight-proportional draw. The key used here is the monotone
    transform w / (-ln u) — SAME ordering as u^(1/w) (both are monotone
    in ln(u)/w), but its magnitude scales WITH the weight, so a fixed
    6-decimal rounding keeps keys distinct at any weight scale (rounding
    ln(u)/w directly collapses large-weight keys onto a tiny lattice and
    degrades the draw into lowest-id selection). One pass, no per-row RNG
    state, reproducible across runs and engines.

    ``weight`` is a Column (or name) of positive weights — e.g. document
    length for byte-budget sampling, or a quality score.

    Scale shape: key computation is row-local; the top-n plans as
    WindowGroupLimit (every map task pre-prunes to its local top-n before
    the single-partition merge, so the exchange carries O(tasks·n) rows).
    Keys round to 6 decimals with id tie-break, so a cross-engine ln()
    ulp cannot reorder the selection.

    Output: input columns + (key, rank), rank 1..n by (key desc, id asc).
    """
    from pyspark.sql import Window

    w = F.col(weight) if isinstance(weight, str) else weight
    # denominator _DENOM + 1 keeps u strictly below 1: u = 1 would make
    # -ln(u) = 0 and the key infinite
    u = (_fate(id_col, seed) + 1) / F.lit(float(_DENOM + 1))
    key = F.round(w.cast("double") / -F.log(u), 6)
    win = Window.orderBy(F.col("__aes_key").desc(), F.col(id_col).asc())
    return (
        df.withColumn("__aes_key", key)
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= n)
        .withColumnRenamed("__aes_key", "key")
    )


def leakage_free_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    test_fraction: float = 0.1,
    seed: int = 42,
    **dedup_kwargs,
) -> DataFrame:
    """Train/test split that CANNOT leak near-duplicates across the
    boundary: every document inherits the fate of its DEDUP CLUSTER
    representative, so a near-dup family lands whole on one side.

    The plain hash split (train_test_split) is contamination-proof across
    corpus versions but blind to content: two near-identical documents
    hash independently and straddle the boundary ~2·p·(1-p) of the time —
    the eval set then scores memorization, not generalization (the
    benchmark-contamination failure mode measured by Lee et al. 2022).
    Here the near-dup clusters come from the full LSH → exact-verify →
    connected-components pipeline (dedup.dedup_corpus — the q68 oracle
    shape), and the split key is the cluster representative's salted md5
    fate: deterministic, engine-portable, stable as the corpus grows
    (adding documents can merge clusters but never reassigns an existing
    cluster fate unless its representative changes — exactly the rebuild
    semantics a versioned corpus wants).

    Scale: the split itself adds ZERO work beyond the dedup pipeline
    already run for curation — one row-local fate hash on the cluster
    key. Output: (id, cluster_rep, split).
    """
    from . import dedup

    clusters = dedup.dedup_corpus(df, id_col, text_col, **dedup_kwargs)
    fate = _fate("cluster_rep", seed)
    return clusters.select(
        F.col(id_col),
        "cluster_rep",
        F.when(
            fate < int(round(test_fraction * _DENOM)), F.lit("test")
        )
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def ipf_reweight(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_iters: int = 2,
) -> DataFrame:
    """Iterative proportional fitting (raking) of the (x, y) contingency
    table toward target marginals: UNIFORM over x, OBSERVED over y — the
    "rebalance sources without disturbing the language mix" reweighting a
    corpus-mixing pass applies before sampling. Each sweep scales cell
    weights to match the x target, then the y target; the classic IPF
    iteration, unrolled ``n_iters`` times (deterministic — no convergence
    test, so the oracle can replay it exactly).

    Scale shape: ONE row scan (cell counts); every sweep is two
    category-sized joins (cells ⋈ per-x sums, cells ⋈ per-y sums) plus a
    broadcast scalar — cost is O(cells · n_iters), independent of rows.
    Returns per cell: ``(x, y, n, weight R6, ratio R6)`` where ``ratio``
    is weight/n — the per-cell sampling multiplier to hand a weighted
    sampler.
    """
    cells = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cells.agg(
        F.sum("n").alias("n_all"),
        F.countDistinct("x").alias("rx"),
    )
    ty = cells.groupBy("y").agg(F.sum("n").alias("t_y"))
    w = cells.crossJoin(F.broadcast(tot)).select(
        "x", "y", "n", "n_all", "rx", F.col("n").cast("double").alias("w")
    )
    for _ in range(n_iters):
        sx = w.groupBy("x").agg(F.sum("w").alias("s_x"))
        w = w.join(sx, "x").select(
            "x", "y", "n", "n_all", "rx",
            (F.col("w") * (F.col("n_all") / F.col("rx")) / F.col("s_x")).alias("w"),
        )
        sy = w.groupBy("y").agg(F.sum("w").alias("s_y"))
        w = w.join(sy, "y").join(F.broadcast(ty), "y").select(
            "x", "y", "n", "n_all", "rx",
            (F.col("w") * F.col("t_y") / F.col("s_y")).alias("w"),
        )
    return w.select(
        F.col("x").alias(x_col),
        F.col("y").alias(y_col),
        F.col("n").cast("long").alias("n"),
        F.round("w", 6).alias("weight"),
        F.round(F.col("w") / F.col("n"), 6).alias("ratio"),
    )
