"""Corpus distribution statistics: smoothed unigram KL drift with
per-token attribution, and PMI collocation mining.

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

from pyspark.sql import DataFrame, Window
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
    return kl_from_counts(
        _token_counts(df_p, text_col), _token_counts(df_q, text_col), top_k
    )


def kl_from_counts(
    cp: DataFrame, cq: DataFrame, top_k: int = 20
) -> DataFrame:
    """The counts-level core of ``unigram_kl``: both sides already reduced
    to ``(token, c)`` frames (the streaming drift monitor feeds its
    maintained reference counts here directly — no text re-scan)."""
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


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Top collocations by pointwise mutual information over ADJACENT
    token bigrams:

        PMI(x, y) = ln( p(xy) / (p(x) · p(y)) ),
        p(xy) = c_xy / M (bigram count / total bigrams),
        p(x)  = c_x  / N (unigram count / total tokens).

    Adjacent bigrams — the standard collocation definition — keep the
    pair stream LINEAR in corpus size (a within-window co-occurrence
    blowup is the cost the co-purchase/containment operators pay when
    the semantics demand it; collocation doesn't). ``min_count`` guards
    the low-frequency PMI pathology (hapax pairs score arbitrarily
    high). Everything is JVM-side array ops: bigrams come from one
    ``transform(sequence(...))`` per document, unigram/bigram counts are
    map-side-combinable groupBys, and the two count joins touch
    vocab-sized frames only. Returns
    ``(w1, w2, c_xy long, pmi double R8)`` ordered (pmi DESC, w1, w2) —
    deterministic under ties — limited to ``top_k``.
    """
    toks = _tokens(F.col(text_col))
    uni = (
        df.select(F.explode(toks).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big = (
        df.select(toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    totals = (
        big.agg(F.count(F.lit(1)).alias("m"))
        .crossJoin(F.broadcast(uni.agg(F.sum("c").alias("n"))))
    )
    pairs = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    scored = (
        pairs.join(
            uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1"
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2"
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "c_xy",
            F.round(
                F.log(
                    (F.col("c_xy") / F.col("m"))
                    / ((F.col("c1") / F.col("n")) * (F.col("c2") / F.col("n")))
                ),
                8,
            ).alias("pmi"),
        )
    )
    return (
        scored.orderBy(
            F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
        )
        .limit(top_k)
        .select("w1", "w2", F.col("c_xy").cast("long").alias("c_xy"), "pmi")
    )


def ks_drift(
    df: DataFrame, group_col: str, value_col, value_name: str = "v"
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic of each group's
    distribution of an integer-valued column against the REST of the
    corpus:

        KS_g = sup_v | F_g(v) − F_rest(v) |

    evaluated at every pooled jump point (which is where the sup of a
    pair of step functions is attained). The distribution-shape
    companion to the token-level KL tripwire above — "did source X's
    document-length profile drift away from everyone else's?"

    Scale shape: one row scan reduces to per-(group, value) counts;
    the evaluation grid is (groups × distinct values) — groups is a
    tiny broadcast dimension and the distinct-value frame is bounded by
    the value domain, never by row count (same posture as roc_auc's
    distinct-score window; use a bounded/discretized value column).
    Cumulatives are per-group windows over that grid.

    Returns ``(group, n_in, n_rest, ks R6, ks_at)`` — ``ks_at`` is the
    smallest value attaining the sup (deterministic across engines:
    both compute the identical IEEE doubles from exact integer counts,
    so the argmax set is identical).
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    base = df.select(F.col(group_col).alias("g"), v.cast("long").alias(value_name))
    pergv = base.groupBy("g", value_name).agg(F.count(F.lit(1)).alias("c"))
    perv = pergv.groupBy(value_name).agg(F.sum("c").alias("ct"))
    perg = pergv.groupBy("g").agg(F.sum("c").alias("n_in"))
    total = perg.agg(F.sum("n_in").alias("n_all"))
    # grid: every group × every pooled value (groups is the tiny side).
    grid = perv.crossJoin(F.broadcast(perg))
    joined = grid.join(pergv, ["g", value_name], "left").select(
        "g",
        value_name,
        "ct",
        "n_in",
        F.coalesce("c", F.lit(0)).alias("c"),
    )
    w = (
        Window.partitionBy("g")
        .orderBy(value_name)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = joined.select(
        "g",
        value_name,
        "n_in",
        F.sum("c").over(w).alias("cum_in"),
        F.sum("ct").over(w).alias("cum_all"),
    ).crossJoin(F.broadcast(total))
    # a group that IS the whole corpus has no "rest" to compare against —
    # drop it rather than emit a 0/0 row (single-group inputs yield empty)
    d = cum.filter(F.col("n_in") < F.col("n_all")).select(
        "g",
        value_name,
        "n_in",
        (F.col("n_all") - F.col("n_in")).alias("n_rest"),
        F.abs(
            F.col("cum_in") / F.col("n_in")
            - (F.col("cum_all") - F.col("cum_in"))
            / (F.col("n_all") - F.col("n_in"))
        ).alias("d"),
    )
    ks = d.groupBy("g", "n_in", "n_rest").agg(F.max("d").alias("ks_raw"))
    return (
        d.join(ks, ["g", "n_in", "n_rest"])
        .filter(F.col("d") == F.col("ks_raw"))
        .groupBy("g", "n_in", "n_rest", "ks_raw")
        .agg(F.min(value_name).alias("ks_at"))
        .select(
            F.col("g").alias(group_col),
            F.col("n_in").cast("long").alias("n_in"),
            F.col("n_rest").cast("long").alias("n_rest"),
            F.round("ks_raw", 6).alias("ks"),
            F.col("ks_at").cast("long").alias("ks_at"),
        )
    )


def dist_psi(
    df: DataFrame,
    group_col: str,
    value_col,
    n_bins: int = 10,
) -> DataFrame:
    """Per-group Population Stability Index and Jensen–Shannon divergence
    of an integer-valued column's distribution against the REST of the
    corpus — the industry-standard "did this slice's profile shift?"
    monitors, computed over ``n_bins`` equal-width bins of the global
    [min, max] range (integer bin math — exact cross-engine; quantile
    bins would need a cross-engine percentile contract).

        PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)      [>0.25 ⇒ major shift]
        JSD = ½ KL(P‖M) + ½ KL(Q‖M),  M = (P+Q)/2  [0..ln 2, symmetric]

    Add-one smoothing over the bin frame keeps both defined when a bin
    is empty on one side. Scale shape: one row scan → per-(group, bin)
    counts; the stats frame is groups × n_bins. Returns
    ``(group, n_in, n_rest, psi R6, jsd R6)``.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    base = df.select(F.col(group_col).alias("g"), v.cast("long").alias("v"))
    mnmx = base.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    binned = base.crossJoin(F.broadcast(mnmx)).select(
        "g",
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.expr(f"((v - mn) * {n_bins}) div (mx - mn + 1)")
        )
        .alias("bin"),
    )
    cells = binned.groupBy("g", "bin").agg(F.count(F.lit(1)).alias("c"))
    gbin = cells.groupBy("bin").agg(F.sum("c").alias("ct"))
    perg = cells.groupBy("g").agg(F.sum("c").alias("n_in"))
    total = perg.agg(F.sum("n_in").alias("n_all"))
    grid = (
        perg.select("g", "n_in")
        .crossJoin(
            F.broadcast(
                df.sparkSession.range(n_bins).select(
                    F.col("id").cast("long").alias("bin")
                )
            )
        )
        .join(gbin, "bin", "left")
        .join(cells, ["g", "bin"], "left")
        .select(
            "g",
            "bin",
            "n_in",
            F.coalesce("c", F.lit(0)).alias("c"),
            F.coalesce("ct", F.lit(0)).alias("ct"),
        )
        .crossJoin(F.broadcast(total))
    )
    p = (F.col("c") + 1) / (F.col("n_in") + n_bins)
    qq = (F.col("ct") - F.col("c") + 1) / (
        F.col("n_all") - F.col("n_in") + n_bins
    )
    m = (p + qq) / 2
    # single-group corpus: no rest-distribution (smoothing would silently
    # compare against uniform noise) — same guard as ks_drift
    scored = grid.filter(F.col("n_in") < F.col("n_all")).select(
        "g",
        "n_in",
        (F.col("n_all") - F.col("n_in")).alias("n_rest"),
        ((p - qq) * F.log(p / qq)).alias("psi_term"),
        (
            F.lit(0.5) * p * F.log(p / m) + F.lit(0.5) * qq * F.log(qq / m)
        ).alias("jsd_term"),
    )
    return (
        scored.groupBy("g", "n_in", "n_rest")
        .agg(
            F.round(F.sum("psi_term"), 6).alias("psi"),
            F.round(F.sum("jsd_term"), 6).alias("jsd"),
        )
        .select(
            F.col("g").alias(group_col),
            F.col("n_in").cast("long").alias("n_in"),
            F.col("n_rest").cast("long").alias("n_rest"),
            "psi",
            "jsd",
        )
    )


def ks_from_counts(
    cp: DataFrame, cq: DataFrame, value_name: str = "v"
) -> DataFrame:
    """Counts-level exact two-sample KS: both sides already reduced to
    ``(value, c)`` frames (the streaming drift monitor feeds maintained
    reference counts here — no re-scan). Returns one row
    ``(n_p, n_q, ks R6, ks_at)``; ``ks_at`` is the smallest value
    attaining the sup. The cumulative window is partition-less over the
    DISTINCT-value frame — the bounded-domain posture (use a
    discretized/bounded value column), same caveat as roc_auc."""
    vocab = (
        cp.withColumnRenamed("c", "cp")
        .join(cq.withColumnRenamed("c", "cq"), value_name, "full_outer")
        .select(
            value_name,
            F.coalesce("cp", F.lit(0)).alias("cp"),
            F.coalesce("cq", F.lit(0)).alias("cq"),
        )
    )
    totals = vocab.agg(
        F.sum("cp").alias("n_p"), F.sum("cq").alias("n_q")
    )
    w = Window.orderBy(value_name).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = (
        vocab.select(
            value_name,
            F.sum("cp").over(w).alias("cum_p"),
            F.sum("cq").over(w).alias("cum_q"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            value_name,
            "n_p",
            "n_q",
            F.abs(
                F.col("cum_p") / F.col("n_p") - F.col("cum_q") / F.col("n_q")
            ).alias("d"),
        )
    )
    ks = d.groupBy("n_p", "n_q").agg(F.max("d").alias("ks_raw"))
    return (
        d.join(ks, ["n_p", "n_q"])
        .filter(F.col("d") == F.col("ks_raw"))
        .groupBy("n_p", "n_q", "ks_raw")
        .agg(F.min(value_name).alias("ks_at"))
        .select(
            F.col("n_p").cast("long").alias("n_p"),
            F.col("n_q").cast("long").alias("n_q"),
            F.round("ks_raw", 6).alias("ks"),
            F.col("ks_at").cast("long").alias("ks_at"),
        )
    )


def zipf_fit(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    max_rank: int = 1000,
) -> DataFrame:
    """Per-group Zipf fit: OLS regression of ln(frequency) on ln(rank)
    over the top ``max_rank`` token types. Natural corpora follow
    slope ≈ −1; a much flatter slope flags synthetic/templated text, a
    much steeper one flags boilerplate domination — a one-number
    fingerprint of lexical naturalness per source.

    One token scan → per-(group, token) counts; ranking is a per-group
    window over the vocab-sized count frame, truncated to ``max_rank``
    (the standard head-fit region — and a hard bound on the regression
    frame). Closed-form OLS from six aggregates; nothing iterative.
    Returns ``(group, n_ranks, slope R6, intercept R6, r2 R6)``.
    """
    counts = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(_tokens(F.col(text_col))).alias("token"),
        )
        .filter(F.length("token") > 0)
        .groupBy("g", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("g").orderBy(F.col("c").desc(), F.col("token").asc())
    ranked = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max_rank)
        .select(
            "g",
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    agg = ranked.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / varx
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_ranks"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias("intercept"),
        F.round(
            F.when(vary > 0, cov * cov / (varx * vary)).otherwise(F.lit(None)),
            6,
        ).alias("r2"),
    )


def corpus_diversity(
    df: DataFrame, group_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-group lexical diversity report: token count, type count
    (distinct tokens), type-token ratio, and Shannon entropy of the
    group's unigram distribution (nats, via the aggregation-friendly
    identity H = ln(N) − Σ c·ln(c) / N) — the corpus-composition
    diagnostic ("is source X boilerplate?"). One token scan → per-(group,
    token) counts (map-side combinable) → one per-group aggregate.
    Returns ``(group, n_tokens long, n_types long, ttr R6, entropy R6)``.
    """
    counts = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(_tokens(F.col(text_col))).alias("token"),
        )
        .filter(F.length("token") > 0)
        .groupBy("g", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy("g")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.round(F.count(F.lit(1)) / F.sum("c"), 6).alias("ttr"),
            F.round(
                F.log(F.sum("c"))
                - F.sum(F.col("c") * F.log("c")) / F.sum("c"),
                6,
            ).alias("entropy"),
        )
        .withColumnRenamed("g", group_col)
    )


def entropy_rate(
    df: DataFrame, group_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-group token entropy rate: conditional next-token entropy
    H(Y|X) = H(bigrams) − H(unigrams) over adjacent pairs — the
    information-theoretic repetitiveness measure (a low rate flags
    templated/boilerplate text even when the unigram entropy looks
    healthy, because the SEQUENCE is predictable). Both entropies via
    the aggregation-friendly identity H = ln N − Σ c·ln c / N; bigrams
    from one row-local transform per document (linear); all frames
    vocab-sized. Returns
    ``(group, n_tokens, n_bigrams, h_unigram R6, h_bigram R6,
    h_rate R6)``.
    """
    toks = _tokens(F.col(text_col))
    uni = (
        df.select(F.col(group_col).alias("g"), F.explode(toks).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("g", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big = (
        df.select(F.col(group_col).alias("g"), toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "g",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
                )
            ).alias("bg"),
        )
        .filter((F.length("bg.w1") > 0) & (F.length("bg.w2") > 0))
        .groupBy("g", "bg.w1", "bg.w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    def h(counts: DataFrame, n_name: str, h_name: str) -> DataFrame:
        return counts.groupBy("g").agg(
            F.sum("c").alias(n_name),
            (
                F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c")
            ).alias(h_name),
        )

    hu = h(uni, "n_tokens", "hu")
    hb = h(big, "n_bigrams", "hb")
    return (
        hu.join(hb, "g", "left")
        .select(
            F.col("g").alias(group_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.round("hu", 6).alias("h_unigram"),
            F.round("hb", 6).alias("h_bigram"),
            F.round(F.col("hb") - F.col("hu"), 6).alias("h_rate"),
        )
    )
