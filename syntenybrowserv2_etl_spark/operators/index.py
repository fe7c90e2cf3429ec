"""Positional inverted index + exact phrase search.

The retrieval-side sibling of the ranking operators (text.tfidf_top_terms /
text.bm25_rank score WHOLE documents; this family answers "which documents
contain this exact token sequence, and where"). A training-data pipeline
needs it for targeted decontamination ("remove every document containing
this leaked benchmark sentence verbatim") and for corpus forensics — both
phrase-shaped, not bag-of-words-shaped, questions.

Scale design (100 TB):
- The index is (term, doc, pos) rows — one narrow explode of the corpus, no
  shuffle to build. Persisted term-bucketed (``write_index``) so a phrase
  query's per-term posting reads are partition-pruned scans: a query for
  3 terms touches 3 buckets' files, never the corpus.
- Phrase matching is posting-list intersection: each term's postings
  normalize to (doc, aligned start) and the candidate set only SHRINKS
  through plain equi-joins. Join ORDER is a measured policy, not dogma
  (SCALE.md "phrase search anchor choice"): by default left-to-right with
  NO stats pre-pass — AQE broadcasts the smaller side of every adjacency
  join, so a rare term collapses candidates the moment it joins; the
  classic rare-term-first ordering is opt-in via ``term_stats`` (free from
  the ``_stats`` dictionary sidecar) for the regime where posting lists
  exceed the broadcast budget and shuffle volume follows df(anchor).
- Positions are 1-based to match SQL ``generate_subscripts`` so the DuckDB
  oracles compare bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .dedup import normalize_text


def _phrase_tokens(phrase: str) -> list[str]:
    """Driver-side twin of the index's tokenization. ``normalize_text``
    splits on Java ``\\s+`` — ASCII whitespace only — while Python's
    ``str.split()`` treats unicode whitespace (NBSP, thin space …) as
    separators too, so a phrase containing a unicode-space-joined token
    would be mis-split and a verbatim-present leak MISSED. Split on
    exactly Java's ``\\s`` class instead."""
    import re as _re

    return [t for t in _re.split(r"[ \t\n\x0b\f\r]+", phrase.lower()) if t]


def positional_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    term_col: str = "term",
    pos_col: str = "pos",
) -> DataFrame:
    """(id, pos, term) posting rows over normalized whitespace tokens.

    1-based positions (= DuckDB ``generate_subscripts``). Build is one
    projection + posexplode — embarrassingly parallel, zero shuffle; the
    downstream phrase join is what pays shuffles, and only on postings.
    """
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(normalize_text(text_col), " ")).alias(
            pos_col, term_col
        ),
    ).select(
        id_col, (F.col(pos_col) + 1).cast("int").alias(pos_col), term_col
    )


def write_index(index: DataFrame, path: str, term_buckets: int = 256) -> None:
    """Persist the index term-bucketed so per-term reads prune.

    ``partitionBy`` on a raw term column would create |vocab| directories
    (pathological listing at web-corpus vocab sizes); hashing the term into
    a fixed bucket count keeps the directory fan-out constant while still
    letting a phrase query read only |phrase| buckets. Same bucket-space
    reasoning as the streaming merge sink's ``__kb`` routing.

    The base build lands as ``term_bucket=<b>/__ib=0`` so incremental
    appends (``index_append_batch``, batch ids ≥ 1) share one uniform
    partition tree — mixed directory depths would break partition
    discovery. One file per bucket (repartition on the bucket key).
    """
    (
        index.withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets))
        )
        .withColumn("__ib", F.lit(0).cast("long"))
        .repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket", "__ib")
        .parquet(path)
    )
    _write_stats(index, path, 0, overwrite_all=True)


def _write_stats(
    index: DataFrame,
    path: str,
    batch_id: int,
    *,
    overwrite_all: bool = False,
    stats_files: int = 32,
) -> None:
    """Per-batch (term, n_postings) dictionary sidecar under
    ``{path}/_stats`` —
    additive across ``__ib`` partitions, so replaying a batch's dynamic
    overwrite stays idempotent (same discipline as the postings data).
    The ``_stats`` dir name is underscore-hidden from the main postings
    listing; its own ``__ib=`` children contain '=' so they list normally
    when the sidecar is read directly.

    Write parallelism splits by path (VERDICT r10 weak #1): a per-batch
    append covers one batch's vocab (small — one file keeps the sidecar's
    file count ∝ batches), but ``overwrite_all`` covers the ENTIRE index
    vocabulary — 10⁸+ terms at web-corpus scale — so the base build /
    compaction path writes ``stats_files`` files in parallel instead of
    funneling the whole dictionary through one task. ``read_term_stats``
    already sums across files, so the read side is unchanged.
    """
    stats = index.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_postings")
    )
    stats = stats.withColumn("__ib", F.lit(batch_id).cast("long"))
    if overwrite_all:
        (
            stats.repartition(stats_files)
            .write.mode("overwrite")
            .partitionBy("__ib")
            .parquet(f"{path}/_stats")
        )
    else:
        (
            stats.coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__ib")
            .parquet(f"{path}/_stats")
        )


def read_term_stats(
    spark: SparkSession, path: str, terms: list[str] | None = None
) -> dict[str, int]:
    """Posting-count dictionary for ``terms`` (or the whole vocab),
    summed across the base build and every appended batch — POSTING-LIST
    LENGTHS (collection frequency), deliberately NOT document frequency:
    the rare-first join order sizes each join by posting ROWS, and that
    is what a doc contributing a term three times costs. Don't feed these
    to IDF/BM25 (text.tfidf/bm25 compute real docfreq themselves).
    |terms|-row collect — metadata-scale, the free input to
    ``phrase_search(term_stats=...)``.

    Committed batches only (ADVICE r10): a batch that crashed after its
    ``_stats`` write but before its ``_batches`` marker would otherwise
    inflate term counts for every reader until redelivery (which may never
    come if the stream is abandoned); filtering ``__ib`` to marked ids
    makes uncommitted sidecar rows invisible, exactly as ``index_compact``
    drops them."""
    from ..sources.io import committed_ib_predicate

    st = spark.read.parquet(f"{path}/_stats").filter(
        committed_ib_predicate(spark, path)
    )
    if terms is not None:
        st = st.filter(F.col("term").isin(list(set(terms))))
    return {
        r["term"]: r["n"]
        for r in st.groupBy("term")
        .agg(F.sum("n_postings").alias("n"))
        .collect()
    }


def index_append_batch(
    new_docs: DataFrame,
    batch_id: int,
    *,
    index_path: str,
    id_col: str,
    text_col: str,
    term_buckets: int = 256,
) -> None:
    """Grow the persisted positional index incrementally — the ingest path
    that keeps phrase search serving while the corpus streams in, no full
    rebuild: the new docs' postings land as ``term_bucket=<b>/__ib=<batch>``
    sub-partitions (batch ids start at 1; 0 is the base build).

    Idempotent replay (foreachBatch at-least-once), the engine-wide marker
    discipline (similarity.ivf_index_append_batch:796-802): a
    ``_batches/<id>`` marker written LAST skips committed batches; an
    uncommitted replay's dynamic partition overwrite rewrites ITS OWN
    (bucket, batch) sub-partitions — a deterministic function of the same
    inputs — so a crash at any point never duplicates postings (duplicated
    (doc, pos, term) rows would inflate n_matches).

    Read cost is unchanged: postings reads prune on term_bucket; files per
    bucket grow by one per batch (compact periodically, like any streamed
    table).
    """
    if batch_id < 1:
        raise ValueError("index_append_batch: batch_id must be >= 1 (0 is the base build)")
    spark = new_docs.sparkSession
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    fs = hpath(index_path).getFileSystem(spark._jsc.hadoopConfiguration())
    from ..sources.io import batch_is_committed

    marker_p = hpath(f"{index_path}/_batches/{batch_id}")
    if batch_is_committed(spark, index_path, batch_id):
        return  # fully-committed batch redelivered (marker or watermark)
    postings = positional_index(new_docs, id_col, text_col)
    (
        postings.withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets))
        )
        .withColumn("__ib", F.lit(batch_id).cast("long"))
        .repartition("term_bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("term_bucket", "__ib")
        .parquet(index_path)
    )
    # dictionary sidecar: this batch's per-term df increments (additive
    # across __ib partitions; replay overwrites its own partition) — must
    # land BEFORE the marker so a crash between the two replays both.
    _write_stats(postings, index_path, batch_id)
    fs.mkdirs(marker_p)


def index_maintain_stream(
    docs_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    *,
    id_col: str,
    text_col: str,
    term_buckets: int = 256,
):
    """foreachBatch twin of ``index_append_batch``: each micro-batch of new
    documents appends its postings; exactly-once effect via the batch
    marker (at-least-once delivery × idempotent append)."""

    def body(batch_df: DataFrame, batch_id: int) -> None:
        index_append_batch(
            batch_df,
            int(batch_id) + 1,  # reserve 0 for the base build
            index_path=index_path,
            id_col=id_col,
            text_col=text_col,
            term_buckets=term_buckets,
        )

    return (
        docs_stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def multi_phrase_search(
    index: DataFrame,
    phrases: DataFrame,
    phrase_id_col: str = "phrase_id",
    phrase_col: str = "phrase",
    id_col: str = "doc_id",
    term_col: str = "term",
    pos_col: str = "pos",
    broadcast_phrases: bool = True,
) -> DataFrame:
    """Match EVERY phrase of a phrase TABLE against the corpus in one
    set-oriented plan — the batched twin of ``phrase_search`` (the q116:q30
    relationship): a real decontamination run carries thousands of leaked
    benchmark sequences, and a per-phrase driver loop would serialize
    thousands of jobs.

    Plan shape: phrases explode to (phrase_id, offset, term) rows (tiny —
    broadcast); ONE equi-join on term tags each matching posting with
    (phrase_id, offset); grouping by (phrase_id, doc, pos - offset) counts
    matched offsets, and a group hitting the phrase's full length is a
    match at that start. Repeated terms inside a phrase are safe: each
    (phrase_id, offset) contributes at most one row per (doc, start)
    because (doc, pos) is unique in the index. Cost: one pass over the
    postings of any phrase term + one shuffle of the tagged hits —
    independent of |phrases| jobs, linear in hit volume.

    ``broadcast_phrases=True`` (default) force-broadcasts the exploded
    phrase rows — right for eval-suite-scale tables (thousands of leaked
    sequences = a few MB). Pass False for genuinely huge phrase tables
    (tens of millions of rows) so AQE plans the term join from runtime
    sizes instead of an executor-memory-risking forced broadcast.

    Output: (phrase_id, id, n_matches, first_pos), same contract as
    ``phrase_search`` per phrase.
    """
    toks = (
        phrases.select(
            F.col(phrase_id_col),
            F.posexplode(
                F.split(normalize_text(F.col(phrase_col)), " ")
            ).alias("__off", term_col),
        )
        # an empty/whitespace phrase normalizes to a single "" token; drop
        # it so such phrases MATCH NOTHING (phrase_search raises instead —
        # here one bad row must not poison a 10k-row phrase table) rather
        # than pairing with the "" postings empty documents produce
        .filter(F.length(term_col) > 0)
        .withColumn(
            "__plen", F.count(F.lit(1)).over(Window.partitionBy(phrase_id_col))
        )
    )
    if broadcast_phrases:
        toks = F.broadcast(toks)
    hits = index.join(toks, term_col).select(
        phrase_id_col,
        id_col,
        (F.col(pos_col) - F.col("__off")).alias("__start"),
        "__plen",
    )
    starts = (
        hits.groupBy(phrase_id_col, id_col, "__start")
        .agg(F.count(F.lit(1)).alias("__n"), F.max("__plen").alias("__plen"))
        .filter(F.col("__n") == F.col("__plen"))
    )
    return starts.groupBy(phrase_id_col, id_col).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("__start").cast("int").alias("first_pos"),
    )


def index_compact(spark: SparkSession, path: str) -> tuple[int, int]:
    """Fold the appended ``__ib`` sub-partitions back into the base build —
    the small-file compaction a continuously-appended index eventually
    needs (files per bucket grow by one per batch; thousands of batches
    turn every posting read into a listing/open storm).

    Only COMMITTED batches fold (``__ib`` ∈ {0} ∪ marked ids): a batch that
    wrote data but crashed before its ``_batches`` marker is DROPPED here,
    not folded — its redelivery replays the whole batch deterministically,
    and folding it first would make that replay a duplication. Markers are
    preserved across compaction so committed-batch redeliveries stay
    no-ops. The stats sidecar is recomputed from the folded postings (one
    aggregation over rows being rewritten anyway — exactly consistent by
    construction).

    Swap discipline = sources/io.fold_ib_partitions' staged-rename: stage →
    live-aside → promote → delete; a crash leaves either the old index
    intact or recoverable under ``<path>__old``. One file per bucket
    after. Returns (files_before, files_after).
    """
    from ..sources.io import fold_ib_partitions

    return fold_ib_partitions(
        spark,
        path,
        "term_bucket",
        finalize_staging=lambda staged: _write_stats(
            spark.read.parquet(staged), staged, 0, overwrite_all=True
        ),
    )


def read_postings(
    spark: SparkSession, path: str, terms: list[str], term_buckets: int = 256
) -> DataFrame:
    """Read only the buckets that can contain ``terms`` (partition-pruned),
    then filter to the exact terms inside them. Committed batches only
    (``__ib`` ∈ {0} ∪ marked ids — ADVICE r10): postings from a batch that
    crashed before its marker stay invisible until the batch is redelivered,
    so n_matches can never count a half-written batch's rows."""
    import functools

    from ..sources.io import committed_ib_predicate

    idx = spark.read.parquet(path).filter(
        committed_ib_predicate(spark, path)
    )
    # bucket pruning: xxhash64 isn't computable driver-side, so the bucket
    # ids are expressed as foldable Spark expressions (xxhash64 over a
    # literal); ConstantFolding turns each into a literal equality and the
    # disjunction becomes a partition filter — only |terms| directories are
    # listed/scanned (pinned by test_write_index_read_postings_pruned).
    bucket_pred = functools.reduce(
        lambda a, b: a | b,
        [
            F.col("term_bucket")
            == F.pmod(F.xxhash64(F.lit(t)), F.lit(term_buckets))
            for t in terms
        ],
    )
    return (
        idx.filter(bucket_pred)
        .filter(F.col("term").isin(terms))
        .drop("__ib")  # write-side idempotency coordinate, not data
    )


def phrase_search(
    index: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    term_col: str = "term",
    pos_col: str = "pos",
    term_stats: dict[str, int] | None = None,
) -> DataFrame:
    """Exact consecutive-phrase match: (id, n_matches, first_pos).

    Each posting list is normalized to (id, start = pos - offset) so all
    joins are plain equi-joins on (id, start); the candidate set starts at
    the anchor term's postings and every further join only SHRINKS it.
    Overlapping matches all count (n_matches is the number of start
    positions, not a greedy cover).

    Join-order policy, measured (SCALE.md "phrase search anchor choice"):

    - ``term_stats=None`` (default): left-to-right, NO stats pre-pass. AQE
      broadcasts the smaller side of each adjacency join at runtime, so a
      rare term anywhere in the phrase collapses the candidate set the
      moment it joins — computing df first just to pick the anchor costs a
      full postings pass + a blocking job, measured 2.5-3× slower than
      letting AQE handle the asymmetry (50k-800k doc skew fixture).
    - ``term_stats={term: df}``: rare-term-first. When df stats are FREE —
      maintained beside the persisted index (``read_term_stats``, the
      search-engine dictionary pattern; posting-list lengths) — anchoring on the rarest term
      guarantees the first candidate set is the smallest posting list
      regardless of runtime stats quality, the right call when several
      posting lists are each too large to broadcast.
    """
    terms = _phrase_tokens(phrase)
    if not terms:
        raise ValueError("phrase_search: empty phrase")
    if term_stats is None:
        order = list(range(len(terms)))
    else:
        spark = index.sparkSession
        if any(t not in term_stats for t in terms):
            # a phrase term absent from the corpus ⇒ no match anywhere.
            # Empty frame carries the INDEX's id type (not a hardcoded
            # long): a caller unioning per-phrase results or joining back
            # to the corpus must see the same schema as the normal path.
            id_field = index.schema[id_col]
            from pyspark.sql.types import IntegerType, LongType, StructField, StructType

            schema = StructType(
                [
                    StructField(id_col, id_field.dataType, id_field.nullable),
                    StructField("n_matches", LongType(), False),
                    StructField("first_pos", IntegerType(), True),
                ]
            )
            return spark.createDataFrame([], schema)
        order = sorted(range(len(terms)), key=lambda i: (term_stats[terms[i]], i))
    anchor = order[0]
    cand = index.filter(F.col(term_col) == terms[anchor]).select(
        id_col, (F.col(pos_col) - anchor).alias("__start")
    )
    for j in order[1:]:
        post = index.filter(F.col(term_col) == terms[j]).select(
            id_col, (F.col(pos_col) - j).alias("__start")
        )
        cand = cand.join(post, [id_col, "__start"])
    return cand.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("__start").cast("int").alias("first_pos"),
    )
