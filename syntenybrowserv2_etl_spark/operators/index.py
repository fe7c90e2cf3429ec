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
- Phrase matching is rare-term-first intersection, the classic
  posting-list discipline: the anchor (lowest document frequency) term's
  postings set the candidate volume, every further term only SHRINKS it
  via an equi-join on (doc, aligned start). Join order is decided from the
  per-term document frequencies — a |phrase|-row driver-side lookup
  (metadata-scale, the q30/nprobe precedent), after which the whole match
  is ordinary equi-joins that AQE broadcasts when the anchor postings are
  small (the point of picking the rarest anchor).
- Positions are 1-based to match SQL ``generate_subscripts`` so the DuckDB
  oracles compare bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import normalize_text


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
    """
    (
        index.withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets))
        )
        .repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(path)
    )


def read_postings(
    spark: SparkSession, path: str, terms: list[str], term_buckets: int = 256
) -> DataFrame:
    """Read only the buckets that can contain ``terms`` (partition-pruned),
    then filter to the exact terms inside them."""
    import functools

    idx = spark.read.parquet(path)
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
    return idx.filter(bucket_pred).filter(F.col("term").isin(terms))


def phrase_search(
    index: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    term_col: str = "term",
    pos_col: str = "pos",
) -> DataFrame:
    """Exact consecutive-phrase match: (id, n_matches, first_pos).

    Rare-term-first: per-term document frequencies (a |phrase|-row collect —
    metadata-scale) order the joins so the rarest term anchors the candidate
    set and every subsequent join only shrinks it. Each posting list is
    normalized to (id, start = pos - offset) so all joins are plain
    equi-joins on (id, start) — broadcastable when the anchor is rare,
    AQE-planned otherwise. Overlapping matches all count (n_matches is the
    number of start positions, not a greedy cover).
    """
    # same canonicalization as the index side (normalize_text): lowercase,
    # whitespace-collapse — applied driver-side to the literal phrase.
    terms = phrase.lower().split()
    if not terms:
        raise ValueError("phrase_search: empty phrase")
    freqs = {
        r[term_col]: r["df"]
        for r in (
            index.filter(F.col(term_col).isin(list(set(terms))))
            .groupBy(term_col)
            .agg(F.count(F.lit(1)).alias("df"))
            .collect()
        )
    }
    spark = index.sparkSession
    empty = spark.createDataFrame(
        [], f"{id_col} long, n_matches long, first_pos int"
    )
    if any(t not in freqs for t in terms):
        return empty  # a phrase term absent from the corpus ⇒ no match
    order = sorted(range(len(terms)), key=lambda i: (freqs[terms[i]], i))
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
