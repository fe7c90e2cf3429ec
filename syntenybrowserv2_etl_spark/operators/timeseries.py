"""Time-series shaping: gap-filled downsampling and statistical outlier
flagging over the event stream.

The reference's event handling stops at per-file aggregation counts
(src/import_genes.py:138-151 tallies rows per load); a hypertable-style
analytics engine additionally needs REGULAR time grids — BI layers and
model-feature pipelines assume every (series, bucket) slot exists, with
zeros where nothing happened — and basic anomaly gates over those grids.

Both operators keep the corpus on the executor side: the only small
relation is the per-series [min, max] span (one row per series), and the
grid itself is generated WHERE THE SERIES LIVES via ``sequence`` +
``explode`` — never a driver-side date loop, never a cross join against a
global calendar table (which would fan every series out to the global
span instead of its own).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def downsample_gapfill(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
    round_to: int = 2,
) -> DataFrame:
    """Per-series bucketed rollup with zero-filled gaps: one row for EVERY
    bucket between each series' first and last event, missing buckets
    carrying n_events = 0 / sum_value = 0.

    Plan shape: one shuffle aggregates events to (series, bucket) — the
    partial agg compresses each scan task to its distinct bucket count
    before the exchange, so the shuffle moves the GRID, not the events.
    The per-series span is a second aggregate over that (already tiny)
    grid; ``sequence(min, max, interval 1 bucket)`` explodes the dense
    spine series-locally, and the spine left-joins the sparse grid back
    on (series, bucket). Both join sides are grid-sized — at 100 TB of
    events the grid is |series| × |span buckets| rows (metadata-scale
    unless the series key is high-cardinality, in which case the join
    keys are already co-partitioned from the same exchange).

    Buckets emit as epoch-µs (the q21 timestamp-representation contract).
    sum_value rounds to ``round_to`` for the cross-engine
    summation-order lattice.

    Output: (series, bucket_us, n_events, sum_value).
    """
    # the grid is materialized: it feeds BOTH the span aggregate and the
    # spine join, and the planner does not reliably reuse the aggregation
    # exchange between those branches (measured: two full event scans in
    # the executed plan without this). The checkpoint is grid-sized —
    # |series| × |active buckets| rows — never the events.
    sparse = (
        events.groupBy(
            F.col(series_col).alias("series"),
            F.date_trunc(bucket, F.col(ts_col)).alias("__b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), round_to).alias("sum_value"),
        )
        .localCheckpoint(eager=True)
    )
    spine = (
        sparse.groupBy("series")
        .agg(F.min("__b").alias("__b0"), F.max("__b").alias("__b1"))
        .select(
            "series",
            F.explode(
                F.sequence(
                    F.col("__b0"), F.col("__b1"), F.expr(f"INTERVAL 1 {bucket}")
                )
            ).alias("__b"),
        )
    )
    return spine.join(sparse, ["series", "__b"], "left").select(
        "series",
        F.unix_micros("__b").alias("bucket_us"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


def zscore_outliers(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    key_col: str = "user_id",
    z_threshold: float = 2.0,
    round_to: int = 4,
    two_sided: bool = False,
) -> DataFrame:
    """Per-(key, day) activity-count outliers against each series'
    population: z = (cnt − mean) / stddev_pop over all (key, day) cells of
    the series, flagged when the ROUNDED z clears the threshold.

    DEFAULT IS ONE-SIDED — positive spikes only (``z >= threshold``; the
    q103 oracle mirrors this): activity COLLAPSES are never flagged. A
    day with zero events doesn't even produce a cell, so the fully-dead
    case is invisible to any z-test on observed cells — detect absences
    with gapfill_hourly's dense spine, not here. ``two_sided=True``
    flags ``|z| >= threshold`` for partial collapses that do produce a
    low-count cell.

    The rounded-score gate is the q87/q92 determinism contract: counts
    are exact integers, but mean/stddev are float aggregates whose
    summation order differs across engines — comparing on the
    ``round_to`` lattice means an ulp of drift cannot flip a flag, so the
    full result value-checks cross-engine (q103).

    Plan shape: one shuffle to the (series, key, day) cell grid (partial
    agg compresses the events first), one grid-sized aggregate to
    per-series moments (|series| rows, broadcast back via the join the
    optimizer collapses to broadcast-hash), one row-local flag. The
    events themselves cross the wire zero times beyond the first
    cell-grid exchange.

    Output: (series, key, day_us, cnt, z, is_outlier).
    """
    cells = events.groupBy(
        F.col(series_col).alias("series"),
        F.col(key_col).alias("key"),
        F.date_trunc("day", F.col(ts_col)).alias("__d"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    moments = cells.groupBy("series").agg(
        F.avg("cnt").alias("__mu"),
        F.stddev_pop("cnt").alias("__sd"),
    )
    z = F.round(
        (F.col("cnt") - F.col("__mu"))
        / F.when(F.col("__sd") > 0, F.col("__sd")),
        round_to,
    )
    flag = (
        (F.abs(z) >= F.lit(z_threshold))
        if two_sided
        else (z >= F.lit(z_threshold))
    )
    return (
        cells.join(F.broadcast(moments), "series")
        .select(
            "series",
            "key",
            F.unix_micros("__d").alias("day_us"),
            "cnt",
            z.alias("z"),
            F.coalesce(flag, F.lit(False)).alias("is_outlier"),
        )
    )


def ohlc(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    ord_col: str = "event_id",
    bucket: str = "day",
    round_to: int = 2,
) -> DataFrame:
    """Open/high/low/close downsampling per (series, bucket) — the
    candlestick rollup every metrics store ships. First/last are defined
    by the TOTAL order (ts, ord) so ties cannot flip open/close across
    engines or re-runs.

    Plan shape: one exchange on (series, bucket) feeds both the
    first/last window ranks and the min/max/count aggregation (same
    partitioning, shared shuffle); at 100 TB this is the
    one-shuffle-per-rollup contract of the q21 sessionizer. min/max/n
    are partial-agg'd; open/close ride the same sort the window already
    needs.

    Output: (series, bucket_us, open, high, low, close, n).
    """
    from pyspark.sql import Window

    # project the grouping attributes FIRST and window over the projected
    # columns: a window partitioned on the raw date_trunc expression does
    # not canonicalize equal to the aggregation's aliased attribute, and
    # the plan grows a second exchange (measured; the shared-shuffle
    # claim below is pinned by test_q106_q107_single_exchange)
    pre = events.select(
        F.col(series_col).alias("series"),
        F.date_trunc(bucket, F.col(ts_col)).alias("__b"),
        F.col(value_col).alias("__v"),
        F.col(ts_col).alias("__ts"),
        F.col(ord_col).alias("__ord"),
    )
    w = Window.partitionBy("series", "__b").orderBy("__ts", "__ord")
    wdesc = Window.partitionBy("series", "__b").orderBy(
        F.col("__ts").desc(), F.col("__ord").desc()
    )
    ranked = pre.select(
        "series",
        "__b",
        "__v",
        F.row_number().over(w).alias("__rn"),
        F.row_number().over(wdesc).alias("__rnd"),
    )
    return ranked.groupBy("series", "__b").agg(
        F.round(F.max(F.when(F.col("__rn") == 1, F.col("__v"))), round_to).alias("open"),
        F.round(F.max("__v"), round_to).alias("high"),
        F.round(F.min("__v"), round_to).alias("low"),
        F.round(F.max(F.when(F.col("__rnd") == 1, F.col("__v"))), round_to).alias("close"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "series", F.unix_micros("__b").alias("bucket_us"),
        "open", "high", "low", "close", "n",
    )


def time_weighted_avg(
    events: DataFrame,
    series_col: str = "event_type",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    ord_col: str = "event_id",
    round_to: int = 4,
) -> DataFrame:
    """Time-weighted average per (series, key) over irregularly-sampled
    values — the hypertable ``time_weight`` aggregate: each observation
    holds until the next one, so its weight is the µs gap to its
    successor (last observation carries zero weight; a series with one
    observation has no defined average and is dropped).

    twavg = Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_n − t_0), weights as EXACT µs integers
    (lead over the (ts, ord) total order), the final ratio rounded for
    the cross-engine summation lattice.

    Plan shape: one exchange on (series, key) shared by the lead window
    and the aggregation — the same single-shuffle discipline as ohlc.

    Output: (series, key, twavg, span_us, n).
    """
    from pyspark.sql import Window

    # same pre-projection discipline as ohlc: window over the aliased
    # attributes the aggregation groups on, so both share ONE exchange
    pre = events.select(
        F.col(series_col).alias("series"),
        F.col(key_col).alias("key"),
        F.col(value_col).alias("__v"),
        F.unix_micros(F.col(ts_col)).alias("__t"),
        F.col(ord_col).alias("__ord"),
    )
    w = Window.partitionBy("series", "key").orderBy("__t", "__ord")
    gaps = pre.select(
        "series",
        "key",
        "__v",
        "__t",
        (F.lead("__t").over(w) - F.col("__t")).alias("__w"),
    )
    return (
        gaps.groupBy("series", "key")
        .agg(
            F.round(
                F.sum(F.col("__v") * F.col("__w"))
                / F.sum("__w"),
                round_to,
            ).alias("twavg"),
            (F.max("__t") - F.min("__t")).alias("span_us"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("twavg").isNotNull())
    )


def cusum_drift(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_col: str | None = None,
    k: float = 0.0,
    h: float = 5.0,
) -> DataFrame:
    """One-sided CUSUM change-point statistic over an ordered series:
    S_t = max(0, S_{t-1} + (x_t - k)), alarm where S_t > h — the classic
    sequential drift detector (upward shifts; mirror the values for the
    downward side).

    The recurrence looks scan-shaped (each S_t needs S_{t-1}), which would
    force a single-pass stateful kernel — but it has a closed form over
    prefix sums: with P_t = Σ_{i≤t}(x_i - k),
    S_t = P_t - min(0, min_{i≤t} P_i) — the running minimum (including the
    EMPTY prefix, value 0) is the last reset point. That turns CUSUM into
    TWO ordinary window functions — cumulative sum and cumulative min —
    so Catalyst plans it like any other analytic (one sort per group,
    whole-stage codegen), no UDF, no iteration, and the same two-window
    plan distributes per group. Ordering ties break on the timestamp
    total order the caller guarantees (pre-aggregate to a grid first, the
    q114 discipline).

    Output: input keys + (p, s, alarm). Float discipline: the statistic
    itself computes in DOUBLE (the reset clamp is least(0.0, …), which
    promotes any decimal input), so cross-engine bit-equality comes from
    DETERMINISM, not exactness — feed values derived from an exact grid
    with the identical expression shape in both engines and the window
    sums fold in the same order (q124 builds its deviations that way).
    """
    from pyspark.sql import Window as W

    keys = [group_col] if group_col else []
    w = (
        W.partitionBy(*keys).orderBy(ts_col)
        if keys
        else W.orderBy(ts_col)
    )
    cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    p = F.sum(F.col(value_col) - F.lit(k)).over(cum)
    out = df.withColumn("p", p).withColumn(
        "s", F.col("p") - F.least(F.lit(0.0), F.min("p").over(cum))
    )
    return out.withColumn("alarm", F.col("s") > F.lit(h))


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust outlier flags per group: |x − median| > k·MAD, the
    median-absolute-deviation counterpart of ``zscore_outliers`` — a
    single wild value inflates mean AND stddev (masking itself from a
    z-test); median and MAD are 50%-breakdown estimators, so the flag
    survives contaminated groups.

    Determinism discipline: both statistics are DISCRETE order-statistic
    picks (the row at position ceil(n/2) of the sorted values — the lower
    median), never interpolated. An interpolated median computes
    a + (b−a)·f whose floating shape differs across engines at the ulp;
    a picked value is a DATA value, identical everywhere, so the
    k·MAD comparison boundary is bit-exact cross-engine. Two windows +
    one broadcast join per statistic; distributes per group.

    Output: input columns + (med, mad, dev, is_outlier).
    """
    from pyspark.sql import Window as W

    def _pick(frame: DataFrame, col: str, out: str) -> DataFrame:
        w = W.partitionBy(group_col).orderBy(col)
        wn = W.partitionBy(group_col)
        return (
            frame.withColumn("__rn", F.row_number().over(w))
            .withColumn("__n", F.count(F.lit(1)).over(wn))
            .filter(F.col("__rn") == F.ceil(F.col("__n") / 2.0))
            .select(F.col(group_col), F.col(col).alias(out))
        )

    med = _pick(df.select(group_col, value_col), value_col, "med")
    with_med = df.join(F.broadcast(med), group_col).withColumn(
        "dev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = _pick(with_med.select(group_col, "dev"), "dev", "mad")
    return (
        with_med.join(F.broadcast(mad), group_col)
        .withColumn("is_outlier", F.col("dev") > F.lit(k) * F.col("mad"))
    )
