"""Structured Streaming execution tests: the streaming twins produce the
same results as their batch formulations when driven to completion."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from syntenybrowserv2_etl_spark import queries
from syntenybrowserv2_etl_spark.streaming import events as stream_ops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events re-materialized as µs timestamps in several files (the ns
    parquet needs the nanosAsLong conversion, done once here).

    Files are written as contiguous time quartiles, oldest first, so the
    file-source stream replays in event-time order — the realistic arrival
    pattern watermark semantics assume. Random row→file assignment would
    make the watermark (correctly) drop most of each later file as late.
    """
    out = str(tmp_path_factory.mktemp("events_stream"))
    # queries.t() owns the ts-dtype dispatch (ns-as-bigint vs µs NTZ);
    # reusing it keeps this fixture immune to testdata type drift.
    df = queries.t(spark, SF, "events")
    df = df.withColumn("_us", F.unix_micros("ts"))
    bounds = df.approxQuantile("_us", [0.25, 0.5, 0.75], 0.0)
    lo = None
    for hi in [*bounds, None]:
        part = df
        if lo is not None:
            part = part.filter(F.col("_us") > lo)
        if hi is not None:
            part = part.filter(F.col("_us") <= hi)
        part.drop("_us").coalesce(1).write.mode("append").parquet(out)
        lo = hi
    return out


def test_windowed_counts_matches_batch(spark, events_dir):
    stream = stream_ops.read_events_stream(spark, events_dir)
    result = stream_ops.run_to_completion(
        stream_ops.windowed_counts(stream), "win_counts", output_mode="complete"
    )
    batch = spark.read.parquet(events_dir)
    expected = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    got = {tuple(r) for r in result.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want and len(got) > 0


def test_streaming_dedup(spark, events_dir):
    stream = stream_ops.read_events_stream(spark, events_dir)
    result = stream_ops.run_to_completion(
        stream_ops.streaming_dedup(stream), "dedup_stream"
    )
    n_src = spark.read.parquet(events_dir).count()
    assert result.count() == n_src  # event_ids unique in source


def test_sessionize_stream_runs(spark, events_dir):
    stream = stream_ops.read_events_stream(spark, events_dir)
    result = stream_ops.run_to_completion(
        stream_ops.sessionize(stream, gap="30 minutes"), "sessions"
    )
    rows = result.collect()
    assert len(rows) > 0
    assert all(r["session_end"] >= r["session_start"] for r in rows)


def test_stateful_running_totals_matches_batch(spark, events_dir):
    stream = stream_ops.read_events_stream(spark, events_dir)
    result = stream_ops.run_to_completion(
        stream_ops.running_user_totals(stream), "user_totals", output_mode="update"
    )
    # update mode emits one row per (user, microbatch); the final state is
    # the last emission per user
    final = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in result.orderBy("n_events").collect()
    }
    batch = spark.read.parquet(events_dir)
    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("s"),
        )
        .collect()
    }
    assert set(final) == set(want)
    for u in want:
        assert final[u][0] == want[u][0]
        assert abs(final[u][1] - want[u][1]) < 0.05  # per-batch rounding drift


def test_foreachbatch_upsert_lww(spark, events_dir, tmp_path):
    out = str(tmp_path / "upserted")
    stream = stream_ops.read_events_stream(spark, events_dir)
    # key by user_id: final table = latest event per user (LWW on ts)
    q = stream_ops.upsert_stream_to_parquet(
        stream, out, pk=["user_id"], arrival_col="ts"
    )
    q.awaitTermination()
    got = {
        r["user_id"]: r["event_id"]
        for r in spark.read.parquet(out).collect()
    }
    batch = spark.read.parquet(events_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc())
    want = {
        r["user_id"]: r["event_id"]
        for r in batch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert set(got) == set(want)
    # ts ties can pick either event; compare on the (user, max_ts) level
    batch_max = {
        r["user_id"]: r["mx"]
        for r in batch.groupBy("user_id").agg(F.max("ts").alias("mx")).collect()
    }
    final_ts = {
        r["user_id"]: r["ts"] for r in spark.read.parquet(out).collect()
    }
    assert final_ts == batch_max


def test_stream_stream_interval_join_matches_batch(spark, events_dir):
    stream = stream_ops.read_events_stream(spark, events_dir)
    out = stream_ops.click_purchase_attribution(stream, horizon="1 hour")
    got = stream_ops.run_to_completion(out, "attribution_test")
    batch = spark.read.parquet(events_dir)
    want = stream_ops.click_purchase_attribution(batch, horizon="1 hour")
    g = {tuple(r) for r in got.select("click_id", "purchase_id").collect()}
    w = {tuple(r) for r in want.select("click_id", "purchase_id").collect()}
    # inner stream-stream join: every batch match must appear exactly once
    assert g == w
    assert len(g) == got.count()  # no duplicate emissions across batches
    # attribution window actually binds: all matches within the horizon
    spans = want.select(
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("d")
    ).collect()
    assert all(0 <= r["d"] <= 3_600_000_000 for r in spans)


def test_stream_static_enrich_matches_batch(spark, events_dir):
    """Stream-static dimension join (stateless, append-mode) produces the
    same enriched rows as the identical batch join."""
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    stream = stream_ops.read_events_stream(spark, events_dir)
    got = stream_ops.run_to_completion(
        stream_ops.enrich_with_dim(stream, customer), "enrich_test"
    )
    batch = spark.read.parquet(events_dir)
    want = stream_ops.enrich_with_dim(batch, customer)
    g = {
        (r["event_id"], r["c_name"], r["c_nationkey"])
        for r in got.select("event_id", "c_name", "c_nationkey").collect()
    }
    w = {
        (r["event_id"], r["c_name"], r["c_nationkey"])
        for r in want.select("event_id", "c_name", "c_nationkey").collect()
    }
    assert g == w and len(g) == batch.count()
    # the join actually enriches: at least one event got a real c_name
    assert any(name is not None for (_, name, _) in g)


def test_enrich_broadcast_opt_out_leaves_strategy_to_aqe(spark, events_dir):
    """broadcast=False must emit no broadcast hint so AQE sizes the join
    itself — the escape hatch for dimensions past the broadcast ceiling.
    (With the hint, the plan is pinned to BroadcastHashJoin.)"""
    batch = spark.read.parquet(events_dir)
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    hinted = stream_ops.enrich_with_dim(batch, customer)
    free = stream_ops.enrich_with_dim(batch, customer, broadcast=False)
    hp = hinted._jdf.queryExecution().optimizedPlan().toString()
    fp = free._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" in hp or "broadcast" in hp.lower()
    assert "ResolvedHint" not in fp
    # same results either way
    assert hinted.count() == free.count()
