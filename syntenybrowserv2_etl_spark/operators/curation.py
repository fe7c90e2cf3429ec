"""Corpus-curation operators for training-data pipelines.

The post-dedup passes a 100 TB pretraining corpus needs before tokens reach
a trainer: benchmark-contamination detection, boilerplate measurement,
weighted epoch mixing, and sequence packing. Everything is native Column
expressions over the engine-portable md5 hash family (functions/hashing.py)
— no RNG, no Python UDFs — so each op is reproducible across engines and
verifiable against a DuckDB oracle.

Scale posture per op is documented on the function; the common theme:
row-local derivations, inverted-index joins instead of all-pairs, explicit
sharding for anything that would otherwise need a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing
from . import dedup as dedup_ops
from .sampling import _DENOM, _fate


def contaminated_ids(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Benchmark-contamination scan: train docs sharing ≥1 k-token gram
    with any benchmark/eval document.

    The decontamination pass every serious pretraining corpus runs (the
    n-gram-overlap formulation popularized by GPT-3/PaLM dataset reports).
    Gram sets are row-local (dedup.shingles — staged arrays, no global
    distinct); the benchmark side collapses to distinct 40-bit gram hashes
    — a few MB for any real eval suite — so the semi-join broadcasts and
    the train corpus NEVER shuffles: scan → hash → broadcast-semi-join →
    distinct ids. Output: distinct contaminated ``id_col`` rows.
    """
    t_grams = dedup_ops.shingles(train, id_col, text_col, k=k).select(
        F.col(id_col), hashing.md5_long("shingle").alias("__g")
    )
    b_grams = (
        dedup_ops.shingles(benchmark, id_col, text_col, k=k)
        .select(hashing.md5_long("shingle").alias("__g"))
        .distinct()
    )
    return (
        t_grams.join(F.broadcast(b_grams), "__g", "left_semi")
        .select(id_col)
        .distinct()
    )


def boilerplate_stats(
    df: DataFrame, id_col: str, text_col: str, min_chars: int = 1
) -> DataFrame:
    """Per-document boilerplate measurement: how many of a doc's sentences
    also appear in OTHER documents (C4-style repeated-line removal, at
    sentence granularity since the corpus is single-line text).

    Sentences = '.'-separated spans, trimmed, lowercased, length ≥
    ``min_chars``; ``array_distinct`` pre-shrinks each row locally, and the
    per-doc set is then made distinct on the HASHED key — so ``n_sentences``
    counts post-hash-distinct sentences, collision-identically to any SQL
    oracle that does ``DISTINCT (id, hash)``. Cross-doc frequency is an
    inverted index: explode → groupBy(sentence) countDistinct(doc) → join
    back — shuffles carry (sentence-hash, id) pairs, never documents, and
    the frequency side aggregates before the join. Output: (id,
    n_sentences, n_shared) — a doc with high n_shared/n_sentences is
    boilerplate-heavy.
    """
    staged = df.withColumn(
        "__raw_sents", F.split(F.lower(F.col(text_col)), r"\.")
    )
    sents = staged.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.transform("__raw_sents", lambda s: F.trim(s)),
                    lambda s: F.length(s) >= min_chars,
                )
            )
        ).alias("__sent"),
    )
    # hash the sentence once: every downstream shuffle key is 8 bytes.
    # distinct() AFTER hashing: a within-doc hash collision between two
    # distinct sentences must count once on both engines.
    keyed = dedup_ops._materialize(
        sents.select(F.col(id_col), hashing.md5_long("__sent").alias("__s"))
        .distinct()
    )
    freq = keyed.groupBy("__s").agg(
        F.count_distinct(F.col(id_col)).alias("__df")
    )
    return (
        keyed.join(freq, "__s")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum((F.col("__df") >= 2).cast("long")).alias("n_shared"),
        )
    )


def upsample_by_weight(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted epoch mixing: each row appears
    ``floor(w)`` times plus one more for the hash-chosen ``frac(w)``
    fraction of its stratum — so a stratum with weight 2.25 contributes
    exactly ~2.25 epochs, reproducibly (same ids every run, no RNG).

    This is the corpus-mixing primitive (upweight rare languages / quality
    tiers, downweight crawl dumps) — row-local arithmetic + explode, no
    shuffle, no join; the fractional fates reuse the hash-sampling lattice
    (operators/sampling.py) so mixes are stable as the corpus grows.
    Output: input rows × their multiplicity with a 1-based ``copy`` index
    (copy feeds downstream shard/shuffle keys so repeats land in
    different training shards). Weight 0 drops the stratum.
    """
    wmap = F.create_map(
        *[x for k, v in weights.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    w = F.coalesce(wmap[F.col(strata_col)], F.lit(float(default_weight)))
    # integer-lattice fractional part: both engines compare exact integers.
    # ROUND (not FLOOR) before the cast: Spark computes the fraction in
    # binary doubles while a SQL oracle typically uses DECIMAL, and a
    # non-binary-exact weight (0.29 → 289999.999…) would floor one lattice
    # unit apart cross-engine. Rounding makes any weight with ≤6 decimal
    # digits land identically; finer weights are lattice-rounded.
    extra = (
        _fate(id_col, seed)
        < F.round((w - F.floor(w)) * _DENOM).cast("long")
    ).cast("long")
    n = (F.floor(w).cast("long") + extra).alias("__n_copies")
    return (
        df.withColumn("__n_copies", n)
        .filter(F.col("__n_copies") > 0)
        .withColumn("copy", F.explode(F.sequence(F.lit(1), F.col("__n_copies"))))
        .drop("__n_copies")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int,
    shards: int = 32,
) -> DataFrame:
    """Contiguous-fill sequence packing: assign documents to fixed
    token-budget training sequences.

    Documents get a deterministic global order (id hash), a running token
    cumsum, and ``seq = floor(preceding_tokens / budget)`` — each doc
    *starts* in that sequence; an over-budget doc spans into the next
    (truncate/continue is the consumer's policy, as in standard packed
    pretraining loaders).

    Scale shape: a single global window would sort the corpus on ONE task.
    Packing is therefore sharded — ``shard = id_hash % shards`` partitions
    the window, sequences are keyed (shard, seq), and each shard packs
    independently (training shards are independent anyway). At 100 TB set
    shards ≈ corpus_tokens / (budget · ~100k seqs) so per-shard sorts fit
    an executor; fill efficiency is unchanged since docs ≪ budget·seqs
    per shard. Output: input columns + shard, seq, seq_pos.
    """
    from pyspark.sql import Window

    h = hashing.md5_long(F.col(id_col))
    staged = df.withColumn("__shard", F.pmod(h, F.lit(shards)).cast("long"))
    w = Window.partitionBy("__shard").orderBy(
        hashing.md5_long(F.col(id_col)), F.col(id_col)
    )
    cum = F.sum(F.col(token_count_col)).over(w)
    return (
        staged.withColumn(
            "seq",
            F.floor(
                (cum - F.col(token_count_col)) / F.lit(budget)
            ).cast("long"),
        )
        .withColumn("seq_pos", F.row_number().over(w))
        .withColumnRenamed("__shard", "shard")
    )


def dedup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 32,
) -> DataFrame:
    """Span-level (C4/RefinedWeb "line-level") dedup: remove REPEATED
    passages across the corpus while keeping every document.

    Each document splits into non-overlapping ``span_tokens``-token windows
    (the span stands in for the newline-delimited line of C4 §2.2 — the
    testdata corpus has no newlines, and fixed windows are the
    boundary-free generalization); for each distinct span the FIRST
    corpus-wide occurrence survives (first = smallest (doc_id, span_idx) —
    deterministic, engine-portable), every later occurrence is dropped,
    and documents are reassembled from their surviving spans in order.

    Scale shape: chunking is row-local (zero shuffle, chunk_documents);
    winner election is one shuffle of the span rows (WindowGroupLimit
    prunes non-winners before the exchange); reassembly shuffles
    surviving spans by doc id once. No all-pairs stage anywhere, output
    ≤ input: linear at any corpus size. The election key is (40-bit
    hash, token count, SPAN TEXT): the hash prefix keeps comparisons
    cheap, and the text suffix — already in the shuffled row — makes a
    hash collision between distinct spans harmless (each keeps its own
    group) instead of silently deleting passages at billion-span scale.

    Output: (id, n_spans, n_spans_kept, clean_text) — one row per input
    document; fully deduped documents keep an empty clean_text (the
    caller's filter decides their fate, matching C4's doc-survival rule).
    """
    spans = chunk_documents(
        df, id_col, text_col, chunk_tokens=span_tokens, overlap=0
    ).filter(F.col("n_chunk_tokens") > 0)
    w = Window.partitionBy("chunk_hash", "n_chunk_tokens", "chunk_text").orderBy(
        F.col(id_col).asc(), F.col("chunk_idx").asc()
    )
    kept = (
        spans.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    reassembled = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk_text"))
                ),
                lambda s: s["chunk_text"],
            ),
            " ",
        ).alias("clean_text"),
    )
    totals = spans.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_spans"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(reassembled, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_spans_kept", F.lit(0)).alias("n_spans_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-token-window chunks with overlap — the
    context-window chunking pass that feeds embedding/retrieval indexing
    and long-doc pretraining.

    Chunk i covers tokens [i·stride, i·stride + chunk_tokens) of the
    whitespace-normalized token array, stride = chunk_tokens − overlap;
    the final chunk is short rather than padded. A doc with ≤ chunk_tokens
    words (including an empty doc) yields exactly one chunk. Row-local
    sequence arithmetic + explode — zero shuffle, output rows ≈
    n_tokens/stride per doc, so the operator streams at scan bandwidth at
    any corpus size. Output: (id, chunk_idx, start_tok, n_chunk_tokens,
    chunk_text, chunk_hash).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    from . import dedup

    _d, _norm, _toks = dedup.staged_tokens(df, text_col, "ck")
    staged = (
        _d.withColumn(
            "__ck_n",
            F.when(F.length(_norm) == 0, F.lit(0))
            .otherwise(F.size(_toks))
            .cast("long"),
        )
    )
    n = F.col("__ck_n")
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        (F.floor((n - chunk_tokens + stride - 1) / stride) + 1).cast("long")
    )
    exploded = staged.withColumn(
        "chunk_idx", F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int")))
    )
    start = (F.col("chunk_idx").cast("long") * stride).alias("start_tok")
    clen = F.greatest(
        F.least(F.lit(chunk_tokens), n - F.col("chunk_idx") * stride), F.lit(0)
    ).cast("long")
    chunk_text = F.concat_ws(
        " ",
        F.slice(
            F.col("__ck_toks"),
            (F.col("chunk_idx") * stride + 1).cast("int"),
            clen.cast("int"),
        ),
    )
    d2 = exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start,
        clen.alias("n_chunk_tokens"),
        chunk_text.alias("chunk_text"),
    )
    return d2.withColumn("chunk_hash", hashing.md5_long("chunk_text"))


def temperature_mix_weights(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    budget: float = 1000.0,
) -> DataFrame:
    """Temperature-based sampling weights across corpus sources — the
    multilingual/multi-source mixing rule (p_g ∝ n_g^α) of mT5/XLM-R-style
    training pipelines: α=1 is proportional sampling, α→0 uniform;
    0<α<1 upweights small sources without letting giants starve them.

    One partial-aggregated groupBy produces the per-source counts; the
    weight normalization happens against a single broadcast total row
    (the source table is tiny relative to the corpus — thousands of
    entries at web scale — so this stage is negligible whatever the
    corpus size). Probabilities and expected document counts are rounded
    to 6 decimals for cross-engine comparability; the double pow/sum ulp
    risk under the rounding is the same accepted class as q54's AVG.

    Output: (group, n_docs, p, expected_docs) — p sums to ~1, and
    expected_docs = budget·p is the per-source draw for one epoch of
    ``budget`` documents.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    w = counts.withColumn(
        "__w", F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    )
    tot = F.broadcast(w.agg(F.sum("__w").alias("__tot")))
    return (
        w.crossJoin(tot)
        .select(
            group_col,
            "n_docs",
            F.round(F.col("__w") / F.col("__tot"), 6).alias("p"),
            F.round(
                F.lit(float(budget)) * (F.col("__w") / F.col("__tot")), 6
            ).alias("expected_docs"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): score each
    document with the corpus unigram LM (text.unigram_logprob — the
    scalable stand-in for a KenLM perplexity), then split each language
    into equal head / middle / tail tertiles. Bucket 1 = head (most
    corpus-typical vocabulary), ``n_buckets`` = tail; CCNet trains on
    head+middle and drops or down-weights the tail.

    Ranking uses the 4-decimal-rounded score (the same cross-engine AVG
    contract as q67) with id tie-break, and bucket assignment is ntile —
    a rank computation, no float-threshold compare, so the cut can never
    flip on a ulp. Docs with no scoreable tokens are excluded (CCNet
    drops empties before bucketing).

    Scale posture: ntile needs each group sorted, so this exact form
    shuffles once on ``group_col`` and sorts within groups — fine while
    the largest language fits a task spill budget. The 100 TB variant
    keeps the same contract but learns the two cutoff scores from a
    hash-sample (sampling.hash_sample) and assigns buckets row-locally
    by broadcast-joined thresholds; the tertile boundaries move by
    O(1/sqrt(sample)) while the pipeline loses the global sort.

    Output: (id, group, score, bucket).
    """
    from . import text as text_ops

    keyed = (
        text_ops.unigram_logprob(df, id_col, text_col, keep_cols=[group_col])
        .filter(F.col("n_scored") > 0)
        .select(id_col, group_col, F.round("mean_logprob", 4).alias("score"))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return keyed.select(
        F.col(id_col),
        F.col(group_col),
        "score",
        F.ntile(n_buckets).over(w).alias("bucket"),
    )


def perplexity_buckets_sampled(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    n_buckets: int = 3,
    sample_mod: int = 10,
    seed: int = 7,
) -> DataFrame:
    """The 100 TB variant of perplexity_buckets: SAME contract (per-group
    head/middle/tail quality buckets from the corpus-LM score, bucket 1 =
    head), but the cut scores are learned from a deterministic hash
    sample and broadcast — bucketing becomes a row-local threshold
    compare, and the per-group global sort (ntile's requirement, the
    exact version's only data-sized cost) disappears entirely.

    Stages: score every doc (unchanged) → hash-sample ~1/``sample_mod``
    of each group (md5 fate on the id — deterministic, engine-portable,
    the sampling.hash_sample discipline) → per-group approximate
    quantiles at (nb-1)/nb … 1/nb via percentile_approx over the SAMPLE
    (n_groups rows out) → broadcast-join the cutoff arrays back →
    bucket = 1 + |{cutoffs c : score < c}|, a row-local array op.

    Accuracy: tertile boundaries from a q-sample move by O(1/√|sample|)
    relative rank — at production group sizes (10⁸+ docs, 10⁷ samples)
    the boundary jitter is ~1e-4 of the group, far below any training
    signal; the EXACT ntile twin (perplexity_buckets, q81) remains the
    oracle-checked reference and the audit path for small groups, and
    the sampled variant is pinned against it by tolerance tests
    (bucket-size balance, score monotonicity, agreement rate).

    Plan shape: zero Window/Sort over the corpus (plan-pinned) — the only
    aggregations beyond the LM scorer are over the sample, and the cutoff
    join broadcasts n_groups rows.

    Output: (id, group, score, bucket) — same schema as the exact twin.
    """
    from . import text as text_ops

    keyed = (
        text_ops.unigram_logprob(df, id_col, text_col, keep_cols=[group_col])
        .filter(F.col("n_scored") > 0)
        .select(id_col, group_col, F.round("mean_logprob", 4).alias("score"))
    )
    probs = [round((n_buckets - i) / n_buckets, 9) for i in range(1, n_buckets)]
    sample = keyed.filter(
        F.pmod(hashing.md5_long(F.concat_ws("#", F.col(id_col), F.lit(str(seed)))), F.lit(sample_mod)) == 0
    )
    cutoffs = F.broadcast(
        sample.groupBy(group_col).agg(
            F.percentile_approx("score", probs).alias("__cuts")
        )
    )
    return (
        keyed.join(cutoffs, group_col, "left")
        .select(
            F.col(id_col),
            F.col(group_col),
            "score",
            # descending cutoffs c_1 >= … >= c_{nb-1}: bucket = 1 + count
            # of cutoffs the score falls strictly below; a group too small
            # to have sampled cutoffs lands whole in bucket 1 (head) —
            # the conservative keep-it choice
            F.when(F.col("__cuts").isNull(), F.lit(1))
            .otherwise(
                F.lit(1)
                + F.size(
                    F.filter("__cuts", lambda c: F.col("score") < c)
                )
            )
            .cast("int")
            .alias("bucket"),
        )
    )


def session_examples(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    ord_col: str = "event_id",
    label_col: str = "event_type",
    gap_minutes: int = 30,
    max_prefix: int = 8,
) -> DataFrame:
    """Next-event-prediction examples from a sessionized behavior log —
    the dataset-construction step that turns raw clickstream into
    supervised (context → next action) training rows: for every event
    past the first in its session, emit the last ``max_prefix`` in-session
    actions as the context and the event itself as the label.

    ONE exchange total, by construction: sessionization (gap-flag
    cumsum), step position, and the context window all run as window
    functions over the SAME (user) partitioning and (ts, ord) order —
    the step is ``rn − session_start_rn + 1`` (session start recovered
    as a running max of flagged row numbers) instead of a second
    row_number over (user, session), which would force a second
    hash exchange on the composite key (plan-pinned: exactly one
    Exchange).

    The context is a FIXED window frame (``max_prefix`` preceding rows,
    the training context-window cap), sliced down to the in-session
    suffix — bounded per-row state, so a mega-user cannot quadratically
    inflate the window buffer the way an unbounded running collect_list
    would (each row would otherwise carry its full history).

    Output: (user, session_id, step, prefix, label) — prefix is the
    '/'-joined last min(step−1, max_prefix) in-session labels, step ≥ 2.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, ord_col)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ctx = w.rowsBetween(-max_prefix, -1)
    flagged = events.withColumn("__prev_ts", F.lag(ts_col).over(w)).withColumn(
        "__new_s",
        F.when(
            F.col("__prev_ts").isNull()
            | (
                F.col(ts_col)
                > F.col("__prev_ts") + F.expr(f"INTERVAL {gap_minutes} MINUTE")
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    staged = (
        flagged.withColumn("session_id", F.sum("__new_s").over(cum))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "__start_rn",
            F.max(F.when(F.col("__new_s") == 1, F.col("__rn"))).over(cum),
        )
        .withColumn("__arr", F.collect_list(label_col).over(ctx))
    )
    step = F.col("__rn") - F.col("__start_rn") + 1
    plen = F.least(step - 1, F.lit(max_prefix))
    return (
        staged.withColumn("step", step.cast("long"))
        .filter(F.col("step") >= 2)
        .select(
            F.col(user_col),
            F.col("session_id").cast("long").alias("session_id"),
            "step",
            F.concat_ws(
                "/", F.slice("__arr", F.size("__arr") - plen + 1, plen)
            ).alias("prefix"),
            F.col(label_col).alias("label"),
        )
    )


def shard_stitch_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 2,
    max_key_df: int | None = None,
) -> DataFrame:
    """Shard-boundary stitching: ordered pairs (left, right) where the
    LAST ``k`` tokens of one document equal the FIRST ``k`` tokens of
    another — the signature of a document split across dump shards (or a
    crawl page split at a pagination boundary) that should be rejoined
    before training. The adjacency relation containment/Jaccard dedup
    cannot express: neither side contains the other.

    Scale shape: each document contributes ONE suffix key and ONE prefix
    key (two k-token strings); detection is a single equi-join on the
    key — linear in corpus size, output-bound like any exact pair join.
    Boundary keys are rare by construction, but a degenerate corpus
    (every page footer ending with the same k tokens) makes a hot key;
    ``max_key_df`` drops keys whose PREFIX-side document frequency
    exceeds it (the ngram_jaccard ``max_df`` discipline) — a stitch
    candidate with a thousand continuations is boilerplate, not a split.

    Returns ``(left_id, right_id, boundary)``. Documents need ≥ k+1
    tokens (a doc that IS its own boundary both ways is noise).
    """
    from .text import _tokens

    ok = df.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") >= k + 1)
    suffix = ok.select(
        F.col(id_col).alias("left_id"),
        F.expr(
            f"array_join(slice(toks, size(toks) - {k} + 1, {k}), ' ')"
        ).alias("boundary"),
    )
    prefix = ok.select(
        F.col(id_col).alias("right_id"),
        F.expr(f"array_join(slice(toks, 1, {k}), ' ')").alias("boundary"),
    )
    if max_key_df is not None:
        keep = (
            prefix.groupBy("boundary")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_key_df)
            .select("boundary")
        )
        prefix = prefix.join(keep, "boundary")
    return (
        suffix.join(prefix, "boundary")
        .filter(F.col("left_id") != F.col("right_id"))
        .select("left_id", "right_id", "boundary")
    )
