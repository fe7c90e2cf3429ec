"""JSONL corpus source / sharded sink — the LLM-domain member of the
source family (text_sources.py covers the reference's TSV/GFF3/VCF/OBO/GAF
surface; web-scale training corpora arrive as JSON-lines dumps).

Validation channel = the engine's V3 discipline (skip row + keep evidence,
never abort the load, never silently drop): malformed lines land intact in
a QUARANTINE output instead of killing a 100 TB ingest or vanishing.
Spark-native path throughout — ``spark.read.json`` with an explicit schema
(schema inference over 100 TB is a full extra pass; required schemas are
also the header-contract stance of S4), PERMISSIVE mode routing corrupt
lines to a named column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CORRUPT = "__corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: str,
    quarantine_path: str | None = None,
) -> DataFrame:
    """Typed rows from a JSONL dump; malformed lines quarantined, not lost.

    PERMISSIVE parse with ``columnNameOfCorruptRecord``: a well-formed line
    fills the schema columns; a malformed one yields NULL columns plus its
    raw text in the corrupt column. The parsed frame is cached before the
    corrupt-column filter — Spark refuses to filter on the internal corrupt
    column of an unmaterialized JSON scan (it would require re-parsing with
    different semantics), and the cache also means clean + quarantine
    branches pay the parse once.

    ``quarantine_path``: when given, corrupt raw lines are written there
    (append — an ingest retries; evidence accumulates) before the clean
    frame returns. When None, corrupt lines are just dropped from the
    returned frame (the caller can diff counts).
    """
    raw = (
        spark.read.schema(f"{schema}, {_CORRUPT} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        .cache()
    )
    corrupt = raw.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    if quarantine_path is not None:
        corrupt.write.mode("append").json(quarantine_path)
    # detach the returned frame from the cache (eager localCheckpoint),
    # then release it: without this every ingest in a long session pins
    # a full parsed copy of its dump in executor storage forever
    clean = (
        raw.filter(F.col(_CORRUPT).isNull())
        .drop(_CORRUPT)
        .localCheckpoint(eager=True)
    )
    raw.unpersist()
    return clean


def write_jsonl_sharded(
    df: DataFrame,
    path: str,
    n_shards: int,
    shard_by: str,
) -> None:
    """Export a corpus as deterministic JSONL shards for training loaders.

    Shard = ``xxhash64(shard_by) pmod n_shards`` — content-addressed, so
    re-running the export over the same rows produces the same shard
    membership (downstream dataloader checkpoints survive a re-export);
    this is the q71 shuffle-shards assignment materialized as files. One
    file per shard (repartition on the shard key before partitionBy —
    the tasks×partitions small-file lesson), laid out as
    ``shard=<k>/part-*.json`` so a loader can mount any subset of shards
    by directory.
    """
    (
        df.withColumn(
            "shard", F.pmod(F.xxhash64(F.col(shard_by)), F.lit(n_shards))
        )
        .repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(path)
    )
