"""Column-level transforms: SURVEY §2.2 (P1-P13) and §2.3 (F1-F6).

Every transform is a native Column expression — zero Python UDFs — so the
whole chain stays inside whole-stage codegen and Catalyst can push filters
into the scan. These are the engine's equivalents of the reference's embedded
per-row Python (citations inline); each is a small composable function over
Columns/DataFrames rather than a loop body.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (file-list digest, conf triple) -> (estimate, sentinel stats, stored-at).
# The size stats behind an estimate are driver-side FS RPCs (getFileStatus
# ×min(n_files, 1024)) — noticeable per-call planning latency on object
# stores, and repeated fan_out calls over the same scan would repay it
# every time. Ingest files are normally immutable, but a pipeline that
# rewrites a path in place (same names, new sizes) must not be served a
# stale estimate for the session lifetime — so each entry carries the
# (size, mtime) of THREE spread-out files (first, middle, last) as a
# staleness sentinel. Lookups younger than _SPLITS_CACHE_TTL_S skip even
# the sentinel RPCs (tight re-plan loops pay zero RPCs); older hits
# re-stat the 3 sentinels and invalidate on any change. An in-place
# rewrite that preserves all three sentinels byte-for-byte can still
# call clear_splits_cache(). Bounded to keep a long-lived session from
# growing it forever.
_SPLITS_CACHE: dict[tuple, tuple[int, tuple, float]] = {}
_SPLITS_CACHE_MAX = 1024
_SPLITS_CACHE_TTL_S = 60.0


def clear_splits_cache() -> None:
    """Drop all memoized split estimates (for pipelines that rewrite
    ingest paths in place and need the next fan_out to re-stat)."""
    _SPLITS_CACHE.clear()


def _estimated_scan_splits(df: DataFrame) -> int:
    """Estimate how many FilePartitions this DataFrame's scan will plan.

    Mirrors Spark's own ``FilePartition.maxSplitBytes`` packing formula:
    ``maxSplit = min(maxPartitionBytes, max(openCostInBytes,
    (Σ size + openCost·n_files) / minPartitionNum))`` and
    ``n ≈ ceil(totalWeightedBytes / maxSplit)``. File COUNT alone is wrong
    in both directions — Spark packs many small files into few partitions
    (maxPartitionBytes/openCostInBytes), and splits one large file into
    many — so the estimate uses the real file sizes (driver metadata
    lookups, capped at 1024 stats and extrapolated past that). Gzip files
    are not splittable: one split each, whatever their size.

    Returns 0 for non-file-backed frames (in-memory ranges, shells).
    """
    try:
        files = df.inputFiles()
    except Exception:
        return 0
    if not files:
        return 0
    spark = df.sparkSession
    jvm = spark._jvm
    as_bytes = jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes
    max_pb = as_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    open_cost = as_bytes(spark.conf.get("spark.sql.files.openCostInBytes", "4MB"))
    min_parts = int(
        spark.conf.get(
            "spark.sql.files.minPartitionNum",
            str(spark.sparkContext.defaultParallelism),
        )
    )
    import hashlib
    import time

    hconf = spark._jsc.hadoopConfiguration()

    def _stat(f: str):
        try:
            p = jvm.org.apache.hadoop.fs.Path(f)
            st = p.getFileSystem(hconf).getFileStatus(p)
            return st.getLen(), st.getModificationTime()
        except Exception:
            return 0, 0

    # three spread-out sentinel files: an in-place rewrite that skips the
    # first file still trips the middle/last sentinel
    sentinel_files = sorted({files[0], files[len(files) // 2], files[-1]})
    key = (
        hashlib.md5("\n".join(files).encode()).hexdigest(),
        len(files),
        max_pb,
        open_cost,
        min_parts,
    )
    now = time.monotonic()
    fresh_sentinel: tuple | None = None  # reused below to avoid re-stats
    cached = _SPLITS_CACHE.get(key)
    if cached is not None:
        est, cached_sentinel, stored_at = cached
        if now - stored_at < _SPLITS_CACHE_TTL_S:
            return est  # young entry: zero RPCs
        fresh_sentinel = tuple(_stat(f) for f in sentinel_files)
        if fresh_sentinel == cached_sentinel:
            _SPLITS_CACHE[key] = (est, cached_sentinel, now)
            return est
    sample = files[:1024]
    stats = {f: _stat(f) for f in sample}
    total = sum(s[0] for s in stats.values())
    if len(files) > len(sample):  # extrapolate by mean size
        total = int(total * len(files) / len(sample))
    n_gz = sum(1 for f in files if f.endswith(".gz"))
    splittable = total if n_gz == 0 else int(total * (1 - n_gz / len(files)))
    weighted = splittable + open_cost * (len(files) - n_gz)
    max_split = min(max_pb, max(open_cost, weighted // max(min_parts, 1)))
    est = n_gz + -(-weighted // max(max_split, 1))  # ceil-div
    if len(_SPLITS_CACHE) >= _SPLITS_CACHE_MAX:
        _SPLITS_CACHE.clear()
    if fresh_sentinel is None:  # reuse sample / aged-path stats, no re-stat
        fresh_sentinel = tuple(
            stats[f] if f in stats else _stat(f) for f in sentinel_files
        )
    _SPLITS_CACHE[key] = (est, fresh_sentinel, now)
    return est


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Guarantee scan parallelism before expression-heavy per-row work.

    A single-file / single-row-group input plans as ONE task, serializing
    regex/array/hash-heavy projections no matter how many cores exist
    (measured: the 3-shingle explode over 5k docs ran 5× slower through a
    1-task scan than repartitioned). Decision is PLAN-ONLY: the scan's
    file listing (``inputFiles`` — already cached in the scan relation)
    plus driver-side size metadata feed Spark's own split-packing formula
    (``_estimated_scan_splits``); no job runs and no ``df.rdd`` lineage is
    materialized. Estimated splits ≥ target ⇒ pass through untouched (a
    large splittable file already scans in parallel; repartitioning it
    would be a pure-waste shuffle). Fewer — including MANY SMALL FILES,
    which Spark packs into few partitions despite their count — ⇒
    round-robin repartition. Non-file sources (in-memory test frames)
    report zero splits and also repartition — correct for their size.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if _estimated_scan_splits(df) >= target:
        return df
    return df.repartition(target)


# ---------------------------------------------------------------------------
# P-ops: projections / derived columns
# ---------------------------------------------------------------------------


def stamp_literal(df: DataFrame, name: str, value) -> DataFrame:
    """P2 — stamp a constant (e.g. CLI taxon id) onto every row.

    Reference: src/import_genes_exons.py:118 (taxonid baked per row).
    Catalyst constant-folds the literal; no per-row cost.
    """
    return df.withColumn(name, F.lit(value))


def strip_chr_prefix(col: Column | str) -> Column:
    """P3 — remove a leading ``chr`` from a sequence id, case-insensitive.

    The reference has two variants: exact ``replace("chr","")``
    (src/import_genes_exons.py:115) and case-insensitive prefix slice
    (src/import_features.py:166-168, src/import_homologs.py:123-127).
    We adopt case-insensitive-anchored as canonical (SURVEY P3): unlike the
    gene-loader's ``replace``, this never mangles an interior "chr".
    """
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, "^(?i)chr", "")


def strip_key_prefix(col: Column | str, prefix: str) -> Column:
    """P4/P13 — drop a literal key prefix (``ID=`` / ``id: `` style).

    Reference: src/import_synteny_blocks.py:101 (``row[9][3:]``),
    src/import_ontology.py:233-245.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, len(prefix) + 1, 2**31 - 1)


def orientation_to_bool(col: Column | str) -> Column:
    """P5 — strand field ``+``/``-`` → boolean same_orientation.

    Reference: src/import_synteny_blocks.py:95.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c == "+"


def attributes_to_map(col: Column | str) -> Column:
    """P6 — GFF3 column-9 ``k=v;k=v`` attribute string → MapType.

    Reference: src/import_features.py:93-99,175-185 hand-splits and keeps a
    whitelist; here the whole attribute string becomes a map and consumers
    pick keys (map access on a missing key is NULL — P7 optionality for
    free). Native ``str_to_map`` keeps this in codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.str_to_map(c, F.lit(";"), F.lit("="))


def dot_to_null(col: Column | str) -> Column:
    """P8 — GFF3 ``.`` placeholder → NULL.

    Reference: src/import_features.py:187-191.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == ".", F.lit(None)).otherwise(c)


def shift_coord(col: Column | str, by: int = 1) -> Column:
    """P9 — cytoband 0-based parser position → 1-based storage (+1).

    Reference: src/import_cytogenetic_loc.py:82. Gene/exon coords stay raw
    0-based (src/import_genes_exons.py:118,128) — the inconsistency is
    intentional and preserved (SURVEY Q6).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c + F.lit(by)


def strand_to_int(col: Column | str) -> Column:
    """P5 variant — GFF3 strand glyph → BCBio/Biopython int coding.

    Reference: src/import_genes_exons.py:119 stores
    ``feature.location.strand``, which Biopython codes as ``+``→1, ``-``→-1,
    ``?``→0, ``.``→None. Kept as a nullable long (the reference's TEXT
    column receives the same ints through SQLite type affinity).
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c == "+", 1)
        .when(c == "-", -1)
        .when(c == "?", 0)
        .otherwise(F.lit(None))
        .cast("long")
    )


def array_to_delimited(col: Column | str, sep: str = "/") -> Column:
    """P10 — join an array column into a delimited string, NULL-safe.

    Reference: src/import_variants.py:86-90 joins VCF ALT alleles with '/',
    guarded for empty/None ALT. ``concat_ws`` of an empty array yields '' —
    match the reference's None by mapping empty → NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    joined = F.concat_ws(sep, c)
    return F.when(c.isNull() | (F.size(c) <= 0), F.lit(None)).otherwise(joined)


def first_element(col: Column | str) -> Column:
    """P11 — first element of an array (VCF INFO['AF'][0] etc.).

    Reference: src/import_variants.py:93, src/import_ontology.py:293-295.
    ``element_at`` returns NULL on empty arrays (Spark ≥3 ansi-off), matching
    the reference's guarded access.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.size(c) > 0, F.element_at(c, 1)).otherwise(F.lit(None))


def first_taxon(col: Column | str) -> Column:
    """P11 variant — GAF ``taxon:9606|taxon:1280`` → 9606 (first wins).

    Reference: src/import_ontology.py:293-295.
    """
    c = F.col(col) if isinstance(col, str) else col
    return first_element(F.split(F.regexp_replace(c, "taxon:", ""), r"\|")).cast("long")


def norm_trim_lower(col: Column | str) -> Column:
    """P12 — strip().lower() normalization (header cells, GAF cells).

    Reference: src/import_homologs.py:94, src/import_ontology.py:292.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c))


def obo_field(line: Column | str, keys: Iterable[str] = ("id", "name", "namespace", "def", "is_a", "is_obsolete")) -> Column:
    """P13 — extract ``key: value`` from an OBO line; NULL if not one of keys.

    Reference: src/import_ontology.py:233-251 does ``line.replace("id: ","")``
    per key; one anchored regex replaces the whole ladder.
    """
    c = F.col(line) if isinstance(line, str) else line
    pat = "^(" + "|".join(keys) + "): (.*)$"
    return F.regexp_extract(c, pat, 2)


# ---------------------------------------------------------------------------
# F-ops: filters
# ---------------------------------------------------------------------------


def drop_comment_lines(df: DataFrame, line_col: str = "value", marker: str = "#") -> DataFrame:
    """F1 — drop comment lines (``#`` GFF3 / ``!`` GAF).

    Reference: src/import_features.py:156-157, src/import_ontology.py:288-291.
    Prefer ``option("comment", ...)`` at read time (pushed into the scan);
    this post-hoc variant serves line-oriented reads.
    """
    return df.filter(~F.col(line_col).startswith(marker))


def filter_type_blacklist(df: DataFrame, col: str, blacklist: Iterable[str]) -> DataFrame:
    """F2 — anti-semijoin against a literal type blacklist.

    Reference: src/import_features.py:107-150 (30-element set), :161-162.
    A literal isin() folds to an in-list predicate pushed to the scan; for a
    blacklist too large to inline, use a broadcast left_anti join instead —
    both avoid a shuffle of the big side.
    """
    return df.filter(~F.col(col).isin(list(blacklist)))


def filter_taxon(df: DataFrame, col: str, taxon_id: int) -> DataFrame:
    """F3 — keep rows matching the target taxon.

    Reference: src/import_ontology.py:297-299.
    """
    return df.filter(F.col(col) == F.lit(taxon_id))


def filter_obsolete(df: DataFrame, flag_col: str) -> DataFrame:
    """F4 — drop OBO terms flagged ``is_obsolete: true``.

    Reference: src/import_ontology.py:252-256 (stateful discard; after
    stanza-grouping it is a plain filter).
    """
    c = F.col(flag_col)
    return df.filter(~F.coalesce(c == "true", F.lit(False)))


def filter_required(df: DataFrame, col: str) -> tuple[DataFrame, DataFrame]:
    """F5 — required-field filter; returns (kept, skipped) for the warn channel.

    Reference: src/import_genes_exons.py:108-113 (missing Dbxref → skip+warn).
    Both legs share the parent plan; Catalyst evaluates the scan once per
    action, and the skipped leg is typically only counted.
    """
    c = F.col(col)
    good = df.filter(c.isNotNull() & (F.length(F.trim(c)) > 0))
    bad = df.filter(c.isNull() | (F.length(F.trim(c)) == 0))
    return good, bad


def drop_blank_lines(df: DataFrame, line_col: str = "value") -> DataFrame:
    """F6 — skip blank/whitespace-only lines (``if row:``).

    Reference: src/import_synteny_blocks.py:94.
    """
    return df.filter(F.length(F.trim(F.col(line_col))) > 0)


# GFF3 feature-type blacklist, merged from the two reference sets with |=
# (src/import_features.py:107-150).
FEATURE_TYPE_BLACKLIST = frozenset(
    {
        "CDS",
        "three_prime_UTR",
        "five_prime_UTR",
        "start_codon",
        "stop_codon",
        "intron",
        "exon",
        "mRNA",
        "transcript",
        "primary_transcript",
        "miRNA",
        "ncRNA",
        "tRNA",
        "rRNA",
        "snRNA",
        "snoRNA",
        "lnc_RNA",
        "scRNA",
        "V_gene_segment",
        "D_gene_segment",
        "J_gene_segment",
        "C_gene_segment",
        "match",
        "cDNA_match",
        "sequence_feature",
        "region",
        "biological_region",
        "chromosome",
        "supercontig",
        "pseudogenic_transcript",
    }
)
