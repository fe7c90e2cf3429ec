"""File-format readers: SURVEY §2.1 S1-S6, S8.

All readers are thin wrappers over ``spark.read.csv``/``text`` with declared
schemas (never inferred) so Catalyst gets pushdown/pruning and the vectorized
reader. Gzip (S1 — reference src/flex_open.py:10-20) is free: Spark infers
the codec from the ``.gz`` suffix on any text-based source.

Scale posture: multi-file reads parallelize by file and by 128 MB split for
splittable formats. Gzipped text is NOT splittable — one .gz = one task — so
at 100 TB the ingest layer should receive many moderate .gz files (or
bgzip/zstd-seekable), which is exactly how genomics archives ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schemas
from ..functions import transforms


class SourceFormatError(ValueError):
    """Raised by precondition checks (V1/V5 hard-abort channels)."""


def _list_files(spark: SparkSession, path: str) -> list[str]:
    """Expand a file/dir/glob path to its data files via the Hadoop FS API.

    Mirrors Spark's own listing rules: directories expand one level, names
    starting with ``_`` or ``.`` (committer metadata) are skipped. Listing
    is metadata-only — no data bytes are read — and works on any
    Hadoop-supported filesystem, so the probe is cluster-correct.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    matches = fs.globStatus(jpath)
    if matches is None:
        raise SourceFormatError(f"{path}: no such file")
    files: list[str] = []

    def keep(p) -> bool:
        name = p.getName()
        return not (name.startswith("_") or name.startswith("."))

    for st in matches:
        if st.isDirectory():
            files += [
                sub.getPath().toString()
                for sub in fs.listStatus(st.getPath())
                if sub.isFile() and keep(sub.getPath())
            ]
        elif st.isFile() and keep(st.getPath()):
            files.append(st.getPath().toString())
    return sorted(files)


# Above this many files the header probe switches from per-file limit(1)
# jobs to ONE distributed job over the path list (see _probe_batched).
_BATCH_PROBE_THRESHOLD = 16


def _head_line(raw, max_bytes: int = 1 << 20) -> str:
    """First physical line from an open byte stream, reading only head
    chunks (64 KiB at a time, 1 MiB cap — header lines are short; the cap
    bounds the probe on a pathological no-newline file)."""
    buf = b""
    while b"\n" not in buf and len(buf) < max_bytes:
        chunk = raw.read(64 * 1024)
        if not chunk:
            break
        buf += chunk
    return buf.split(b"\n", 1)[0].decode("utf-8", "replace").rstrip("\r")


def _probe_one_file(uri: str) -> str:
    """Executor-side head read via pyarrow.fs (local/S3/HDFS/GCS), with
    compression auto-detected from the suffix (.gz heads decompress only
    the bytes needed for the first line)."""
    import pyarrow.fs as pafs

    if uri.startswith("file:"):
        p = uri[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
        fs: pafs.FileSystem = pafs.LocalFileSystem()
    elif "://" in uri:
        fs, p = pafs.FileSystem.from_uri(uri)
    else:
        fs, p = pafs.LocalFileSystem(), uri
    with fs.open_input_stream(p, compression="detect") as raw:
        return _head_line(raw)


def _probe_batched(spark: SparkSession, files: list[str]) -> list[tuple[str, str]]:
    """All heads in ONE Spark job: distribute the path list, open each file
    on the executor with pyarrow.fs, read to the first newline. O(1) jobs
    regardless of glob size — at a 100k-file lake the per-file-job probe
    would pay 100k job-launch round trips; this pays one."""
    paths = spark.createDataFrame([(f,) for f in files], "file string")
    n_part = max(1, min(len(files) // 64 + 1, 256))

    def probe(batches):
        for pdf in batches:
            yield pdf.assign(line=[_probe_one_file(f) for f in pdf["file"]])

    rows = (
        paths.repartition(n_part)
        .mapInPandas(probe, "file string, line string")
        .collect()
    )
    by_file = {r["file"]: r["line"] for r in rows}
    return [(f, by_file[f]) for f in files]


def first_lines(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    """Each file's FIRST physical line.

    Small globs (≤ ``_BATCH_PROBE_THRESHOLD`` files — the genomics-fixture
    case) use one ``spark.read.text(file).limit(1)`` per file: the limit is
    pushed into the scan so only the head is decompressed/read (codec-safe
    for .gz), and "first" is first by construction. Larger globs switch to
    ``_probe_batched`` — one distributed job over the whole path list —
    because per-file jobs are O(n_files) scheduler round trips, which is
    the wrong shape at a 100k-file data lake.

    Empty files yield ``""`` (they then fail the caller's header check,
    which is the right V1/V5 outcome).
    """
    import concurrent.futures as cf

    files = _list_files(spark, path)
    if not files:
        raise SourceFormatError(f"{path}: empty file")
    if len(files) > _BATCH_PROBE_THRESHOLD:
        try:
            return _probe_batched(spark, files)
        except Exception as e:
            # pyarrow.fs covers fewer schemes than Hadoop FS (no
            # abfss/wasbs; hdfs needs libhdfs) and cannot see
            # Hadoop-conf-only credentials, so a deployment whose small
            # globs probe fine must not start failing when a glob grows
            # past the batch threshold — fall back to the per-file
            # Hadoop-path probe below (slower, O(n_files) jobs, but it
            # reads through the same stack as the real load). Warn
            # loudly: at a 100k-file lake the fallback is a multi-hour
            # degradation, and a genuine infra error must not hide in it.
            import logging

            logging.getLogger(__name__).warning(
                "batched header probe failed (%s: %s); falling back to "
                "per-file probes over %d files — this is O(n_files) Spark "
                "jobs and may be slow",
                type(e).__name__, e, len(files),
            )

    def head(f: str) -> tuple[str, str]:
        rows = spark.read.text(f).limit(1).collect()
        return (f, rows[0]["value"] if rows else "")

    with cf.ThreadPoolExecutor(max_workers=min(8, len(files))) as pool:
        return list(pool.map(head, files))


def read_gff3(spark: SparkSession, path: str, require_version_header: bool = False) -> DataFrame:
    """S2/S3 — GFF3 as a 9-column DataFrame, comments skipped at scan.

    Reference: src/import_features.py:154-159 (hand-rolled split),
    src/import_genes_exons.py:100-101 (BCBio). The gene→exon hierarchy is NOT
    recovered recursively; it lives in the ``Parent`` attribute and is joined
    relationally (SURVEY S2/X1).

    ``require_version_header`` implements V1 (src/import_features.py:72-76):
    the first line of each file must be ``##gff-version 3`` else hard abort.
    The check reads only the file heads (limit pushdown), not the data.
    """
    if require_version_header:
        for fname, line in first_lines(spark, path):
            if not line.startswith("##gff-version 3"):
                raise SourceFormatError(
                    f"{fname}: missing '##gff-version 3' header (V1 abort, "
                    "reference src/import_features.py:72-76)"
                )
    return (
        spark.read.option("sep", "\t")
        .option("comment", "#")
        .option("emptyValue", "")
        .schema(schemas.GFF3_RAW)
        .csv(path)
    )


def read_headered_tsv(
    spark: SparkSession,
    path: str,
    expected_columns: list[str],
    header_prefix: str = "##",
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """S4 — headered TSV with a PER-FILE header contract (homolog files).

    Reference: src/import_homologs.py:88-111 — strip the ``##`` prefix,
    lowercase header cells, FAIL on missing expected columns (V5), WARN on
    extras (V4, columns kept). The reference's DictReader re-reads the
    header per file; the relational equivalent validates EVERY file's first
    physical line (per-file limit(1) head probes — see ``first_lines``),
    requires one shared column order across the glob, then lets the CSV
    reader's ``header`` option drop each file's own first line — by
    POSITION, never by cell-value match, so a data row that happens to
    repeat the header cell survives.

    Returns ``(body, warnings)``; warnings may carry an ``extra_columns``
    DataFrame (file, column) for the caller's LoadResult channel (V4).
    """
    canonical: list[str] | None = None
    extra_rows: list[tuple[str, str]] = []
    for fname, raw_header in first_lines(spark, path):
        if raw_header.startswith(header_prefix):
            raw_header = raw_header[len(header_prefix):]
        cols = [transforms_norm(c) for c in raw_header.split("\t")]
        missing = [c for c in expected_columns if c not in cols]
        if missing:
            raise SourceFormatError(
                f"{fname}: missing required columns {missing} (V5 fail, "
                "reference src/import_homologs.py:97-103)"
            )
        if canonical is None:
            canonical = cols
        elif cols != canonical:
            raise SourceFormatError(
                f"{fname}: header {cols} differs from first file's "
                f"{canonical}; the positional multi-file read requires one "
                "shared column order"
            )
        extra_rows += [
            (fname, c) for c in cols if c not in expected_columns
        ]
    warnings: dict[str, DataFrame] = {}
    if extra_rows:
        warnings["extra_columns"] = spark.createDataFrame(
            extra_rows, "file string, column string"
        )
    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in canonical]
    )
    body = (
        spark.read.option("sep", "\t")
        # header=true drops each file's FIRST physical line, positionally;
        # names/types come from the explicit schema (enforceSchema default)
        .option("header", "true")
        .schema(schema)
        .csv(path)
    )
    return body, warnings


def transforms_norm(cell: str) -> str:
    """Driver-side mirror of P12 strip().lower() for header cells."""
    return cell.strip().lower()


def read_headerless_tsv(spark: SparkSession, path: str, schema) -> DataFrame:
    """S5 — positional headerless TSV (synteny blocks, 10 columns).

    Reference: src/import_synteny_blocks.py:90-94. Blank lines (F6) are
    dropped by the CSV reader's all-null filter below.
    """
    df = spark.read.option("sep", "\t").schema(schema).csv(path)
    non_null = None
    for name in df.columns:
        cond = F.col(name).isNotNull()
        non_null = cond if non_null is None else (non_null | cond)
    return df.filter(non_null)


def read_vcf(spark: SparkSession, path: str) -> DataFrame:
    """S6 — VCF: 8 fixed columns + INFO → MapType + ALT → ArrayType.

    Reference: src/import_variants.py:78-93 via PyVCF. Header/meta lines
    start with ``#`` → comment-skipped at scan. ``str_to_map`` on INFO and
    ``split`` on ALT keep everything in codegen.
    """
    raw = (
        spark.read.option("sep", "\t")
        .option("comment", "#")
        .schema(schemas.VCF_RAW)
        .csv(path)
    )
    return raw.select(
        "chrom",
        "pos",
        "id",
        "ref",
        F.when(F.col("alt") == ".", F.lit(None))
        .otherwise(F.split("alt", ","))
        .alias("alt_alleles"),
        transforms.dot_to_null("qual").cast("double").alias("qual"),
        transforms.dot_to_null("filter").alias("filter"),
        transforms.attributes_to_map("info").alias("info"),
    )


def read_gaf(spark: SparkSession, path: str) -> DataFrame:
    """S8 — GAF annotation TSV; ``!`` comment lines skipped at scan.

    Reference: src/import_ontology.py:286-300.
    """
    return (
        spark.read.option("sep", "\t")
        .option("comment", "!")
        .schema(schemas.GAF_RAW)
        .csv(path)
        .select(
            F.trim(F.col(schemas.GAF_GENE_ID_COL)).alias("gene_id"),
            F.trim(F.col(schemas.GAF_TERM_COL)).alias("ontology_id"),
            transforms.first_taxon(F.col(schemas.GAF_TAXON_COL)).alias("taxonid"),
        )
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    required: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Corpus-scale JSON-lines source with an explicit bad-record channel —
    the V3 skip-row-and-warn contract (reference
    src/import_genes_exons.py's missing-qualifier rule) applied to the
    format web-corpus pipelines actually ingest.

    Schema is DECLARED, never inferred (the engine's no-inference rule,
    SURVEY §1.4 — inference costs an extra full scan and locks in whatever
    the first sampled files happened to contain). PERMISSIVE parse routes
    every malformed line into ``_corrupt_record`` instead of killing the
    scan (one bad line in a billion must not fail the job); rows missing
    any ``required`` field join the bad channel too (a parseable line is
    not necessarily a usable document).

    Returns ``(good, bad)``:
      good — declared columns, required fields non-null;
      bad  — (reason, raw) rows for the warn/quarantine sink.

    Scale notes: uncompressed/bzip2 JSONL splits within files; gzip does
    not (one task per .gz file — shard uploads accordingly). Spark refuses
    a query whose only referenced column is the internal corrupt column,
    so the parsed scan is materialized once (the fix Spark's own error
    text prescribes): both channels are EAGERLY computed from one cached
    parse and the cache entry is released before returning — callers of a
    long-lived application never accumulate pinned corpus-sized cache
    entries. At 100 TB the production form stages the parse to parquet
    once and reads good/bad from the staged copy; either way the JSON
    text is parsed exactly once.
    """
    corrupt = "_corrupt_record"
    full_schema = f"{schema}, {corrupt} STRING"
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .json(path)
        .cache()
    )
    try:
        parsed_ok = F.col(corrupt).isNull()
        good = raw.filter(parsed_ok).drop(corrupt)
        bad = raw.filter(~parsed_ok).select(
            F.lit("malformed_json").alias("reason"), F.col(corrupt).alias("raw")
        )
        for col in required or []:
            missing = good.filter(F.col(col).isNull())
            bad = bad.unionByName(
                missing.select(
                    F.lit(f"missing_required:{col}").alias("reason"),
                    F.to_json(F.struct(*[c for c in good.columns])).alias("raw"),
                )
            )
            good = good.filter(F.col(col).isNotNull())
        good = good.localCheckpoint(eager=True)
        bad = bad.localCheckpoint(eager=True)
    finally:
        raw.unpersist()
    return good, bad
