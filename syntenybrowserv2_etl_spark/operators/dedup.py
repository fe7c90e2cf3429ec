"""Deduplication operators for large-scale training-data pipelines.

Five families, all expressed as native Column expressions (no Python UDFs in
any hot path) with engine-portable md5-based hashing (functions/hashing.py)
so every variant is verifiable against a DuckDB oracle:

  exact_dedup            hash-groupBy on normalized text
  ngram_jaccard_pairs    exact n-gram-set Jaccard over candidate pairs
  minhash_signatures     k-permutation MinHash over shingles
  minhash_lsh_candidates banded LSH → candidate pairs (bucket join)
  simhash_fingerprint    64-bit SimHash over token hashes
  embedding_near_dupes   cosine-threshold pairs over embedding vectors

Scale posture:
 - exact: one shuffle on a 40-bit+length key; map-side combine.
 - MinHash/LSH: per-doc work is linear in shingles; the candidate join
   shuffles on (band, band_hash) buckets, never all-pairs. Bucket skew
   (boilerplate docs) is the hot spot — AQE skew-join plus an optional
   bucket-size cap handle it.
 - n-gram Jaccard is quadratic per shared-gram group; it is the *verifier*
   run on LSH candidates, not a standalone full-corpus pass. Common-gram
   blowup is capped by dropping grams with document-frequency > max_df
   (stopword-gram suppression), the standard scalable formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing
from ..functions.transforms import fan_out


def _materialize(df: DataFrame) -> DataFrame:
    """Persist a DataFrame consumed by several downstream branches.

    Without this, each branch of the operator DAG (set sizes, rarity filter,
    both sides of a self-join) recomputes the full upstream — measured 3×
    wall-time on the jaccard path. Eager localCheckpoint (not lazy persist:
    concurrent downstream stages of a single action race to populate a lazy
    cache and each recompute the upstream) materializes once to
    memory-with-disk-spill. This is the local analogue of the 100 TB
    deployment's staged-parquet materialization of the inverted index; the
    traded-away lineage recompute-on-loss is what the staged write gives
    back.
    """
    return df.localCheckpoint(eager=True)


def normalize_text(col):
    """Canonicalization before hashing: lowercase, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def staged_tokens(
    df: DataFrame, text_col: str, prefix: str, *, toks: bool = True
) -> tuple[DataFrame, str, str | None]:
    """Stage normalized text (and optionally its whitespace tokens) as REAL
    columns before any higher-order-function lambda consumes them.

    This is the engine-wide HOF-lambda discipline (SCALE.md "Pitfall"):
    Spark re-evaluates a lambda body per array element with no
    common-subexpression hoisting, so an inlined normalize/split inside a
    ``transform``/``filter``/``aggregate`` lambda is O(n²) per row
    (measured ~200× on the winnowing fingerprinter). Staging as named
    columns — each consumed at least twice downstream so CollapseProject
    cannot re-inline — makes the expensive step once-per-row.

    Returns ``(df, norm_col_name, toks_col_name)``; callers drop the
    ``__{prefix}_*`` columns when done. ``toks=False`` skips the token
    split for char-level consumers (e.g. rolling fingerprints).
    """
    norm = f"__{prefix}_norm"
    out = df.withColumn(norm, normalize_text(text_col))
    if not toks:
        return out, norm, None
    tok = f"__{prefix}_toks"
    return out.withColumn(tok, F.split(F.col(norm), " ")), norm, tok


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the smallest id per normalized-text hash group.

    Hash+length as group key keeps the shuffle key small (vs shuffling full
    documents); the min-id winner rule is deterministic, so results are
    stable across partitionings and match the SQL oracle.
    """
    key = hashing.md5_long(normalize_text(text_col))
    return (
        df.withColumn("__k", key)
        .withColumn("__len", F.length(normalize_text(text_col)))
        .groupBy("__k", "__len")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dupe_count"))
        .select(id_col, "dupe_count")
    )


def tokenize(df: DataFrame, text_col: str, out: str = "token") -> DataFrame:
    """Whitespace tokens of normalized text, position-stamped."""
    df = fan_out(df)
    return df.select(
        *df.columns,
        F.posexplode(F.split(normalize_text(text_col), " ")).alias("pos", out),
    )


def with_shingle_array(
    df: DataFrame, text_col: str, out: str, k: int = 3
) -> DataFrame:
    """Add a k-token shingle *array* column — row-local, staged, O(n).

    The array (not exploded-row) form is what lets MinHash run shuffle-free:
    min over a multiset equals min over the set, so neither `distinct` nor
    `explode` is needed for signature computation.

    The token array is staged via ``staged_tokens`` (the HOF-lambda
    discipline — see its docstring): the inlined form would re-normalize
    and re-split the document once per shingle position, O(n²) per doc.
    """
    d1, norm, toks = staged_tokens(df, text_col, "sha")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    arr = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(F.col(toks), i + 1, k))
    )
    return d1.withColumn(out, F.filter(arr, lambda s: F.length(s) > 0)).drop(
        norm, toks
    )


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct k-token shingles per document, as exploded rows.

    Per-doc set dedup is row-local ``array_distinct`` — the set lives
    within one document, so no global ``distinct()`` shuffle is needed.
    """
    staged = with_shingle_array(fan_out(df), text_col, "__sh_arr", k)
    return staged.select(
        F.col(id_col), F.explode(F.array_distinct("__sh_arr")).alias("shingle")
    )


def minhash_signatures(
    shingle_df: DataFrame, id_col: str, num_hashes: int = 32, seed: int = 42
) -> DataFrame:
    """MinHash signature: per doc, min over shingles of k permuted hashes.

    One groupBy produces all k signature slots (k min-aggregates over the
    same base hash — single shuffle, map-side combined).
    """
    base = hashing.md5_long(F.col("shingle"))
    aggs = [
        F.min(hashing.minhash_value(base, a, b)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(hashing._perm_params(num_hashes, seed))
    ]
    return shingle_df.groupBy(id_col).agg(*aggs)


def minhash_signatures_inline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Shuffle-free MinHash: the entire signature is one row-local fold.

    min(h_i over shingle set) == min(h_i over shingle multiset), so the
    explode → distinct → groupBy pipeline of the relational formulation
    (two full shuffles plus a row blowup of ~tokens-per-doc ×) collapses to
    a single ``aggregate`` over the in-row shingle array. The accumulator
    is the length-``num_hashes`` array of running minima; md5 runs ONCE per
    shingle inside the fold, and each permutation adds only a multiply-add-
    mod on the already-hashed value. A map-only stage: at 100 TB this scans
    and never shuffles a byte — signatures land partition-aligned with the
    source for the downstream LSH band join.

    Docs with no shingles (empty text) produce no signature row, matching
    the relational/SQL formulation where an empty group emits nothing.
    """
    df = fan_out(df)  # the fold is expression-heavy; never run it 1-task
    params = hashing._perm_params(num_hashes, seed)
    a_arr = F.array(*[F.lit(a) for a, _ in params])
    b_arr = F.array(*[F.lit(b) for _, b in params])
    init = F.array_repeat(F.lit(MERSENNE_MAX), num_hashes)
    sig = F.aggregate(
        F.col("__mh_sh"),
        init,
        lambda acc, s: _fold_min(acc, hashing.md5_long(s), a_arr, b_arr),
    )
    # "has ≥1 shingle" ⇔ "normalized text non-empty": a scan-pushable guard,
    # NOT a predicate on the fold result (which Catalyst's filter-pushdown
    # would clone the whole fold expression into).
    sig_df = (
        with_shingle_array(
            df.filter(F.length(normalize_text(text_col)) > 0), text_col, "__mh_sh", k
        )
        .select(F.col(id_col), sig.alias("__sig"))
        .localCheckpoint(eager=False)
    )
    return sig_df.select(
        id_col, *[F.col("__sig")[i].alias(f"mh_{i}") for i in range(num_hashes)]
    )


MERSENNE_MAX = hashing.MERSENNE_P  # > any permuted hash value: identity for min


def _fold_min(acc, base, a_arr, b_arr):
    """One fold step: acc[i] = min(acc[i], (a_i*base + b_i) mod P)."""
    return F.zip_with(
        acc,
        F.zip_with(a_arr, b_arr, lambda a, b: F.struct(a.alias("a"), b.alias("b"))),
        lambda m, ab: F.least(
            m, (base * ab["a"] + ab["b"]) % F.lit(hashing.MERSENNE_P)
        ),
    )


def _banded_keys(
    signatures: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band, key) rows: each signature folded into ``bands`` band keys
    (40-bit hash of the band's concatenated slots). Materialized because
    every caller joins it against itself or a sibling — the shared recall
    stage of minhash_lsh_candidates / minhash_lsh_candidates_cross."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        slots = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                hashing.md5_long(F.concat_ws("_", *slots)).alias("key"),
            )
        )
    return _materialize(
        signatures.select(
            F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
        ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    link: str = "all",
) -> DataFrame:
    """Banded LSH: docs sharing any band signature become candidate pairs.

    Band key = hash of the concatenated slots in the band; self-join within
    (band_idx, band_key) buckets. Output: (id_a, id_b) with id_a < id_b,
    distinct. The join shuffles only bucket keys + ids — documents never
    move.

    ``link="all"`` emits every within-bucket pair — quadratic in
    duplicate-class size *by contract* (a class of g near-identical docs
    shares every band, yielding g(g-1)/2 pairs per band). That is the
    exact, oracle-checkable analytics mode. ``link="star"`` links each
    bucket member to the bucket's min id only — O(class) edges computed
    with a window min instead of a self-join, so candidate volume stays
    linear when replication grows classes (measured: e2e dedup 31.6 s →
    flat at 16× replication). Connected components over star links equal
    components over all-pairs links; the trade (same as
    ``embedding_near_dupes(link="star")``) is that a downstream verifier
    sees only member↔representative pairs, not every member pair.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}): a "
            "remainder would silently drop trailing signature slots and "
            "shift the LSH S-curve away from the requested parameters"
        )
    if link not in ("all", "star"):
        raise ValueError(f"link must be 'all' or 'star', got {link!r}")
    banded = _banded_keys(signatures, id_col, num_hashes, bands)
    if link == "star":
        from pyspark.sql import Window

        w = Window.partitionBy("band", "key")
        return (
            banded.withColumn("__rep", F.min(id_col).over(w))
            .filter(F.col(id_col) != F.col("__rep"))
            .select(
                F.col("__rep").alias("id_a"), F.col(id_col).alias("id_b")
            )
            .distinct()
        )
    a, b_ = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_lsh_candidates_cross(
    sig_left: DataFrame,
    sig_right: DataFrame,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    right_banded: DataFrame | None = None,
) -> DataFrame:
    """Two-sided banded LSH join: left docs sharing any band key with a
    right doc become (id_a, id_b) candidates — the cross-corpus recall
    stage (train × benchmark decontamination, new-snapshot × retained-index
    incremental dedup). Identical banding to ``minhash_lsh_candidates``
    (shared ``_banded_keys``), but across two signature tables, so there is
    no ``id_a < id_b`` ordering — the sides are semantically different and
    both orientations of a pair are the SAME candidate (id_a always left).

    Scale: only band keys + ids shuffle; the benchmark side of a
    decontamination run is small (eval suites, not corpora), so AQE
    broadcasts its banded keys and the train corpus never moves.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}): a "
            "remainder would silently drop trailing signature slots and "
            "shift the LSH S-curve away from the requested parameters"
        )
    a = _banded_keys(sig_left, id_col, num_hashes, bands).alias("a")
    # right_banded: a STATIC right side (an eval suite probed every micro-
    # batch) can pass its banded keys precomputed once — recomputing them
    # here would re-run the banding job per call (see band_keys_cross)
    b = (
        right_banded if right_banded is not None
        else _banded_keys(sig_right, id_col, num_hashes, bands)
    ).alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def band_keys_cross(
    signatures: DataFrame, id_col: str, num_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """Materialized (id, band, key) rows for a STATIC join side — stage
    once, pass to ``minhash_lsh_candidates_cross(right_banded=...)`` so a
    per-batch caller (streaming decontamination gate) doesn't re-run the
    banding job every micro-batch."""
    return _banded_keys(signatures, id_col, num_hashes, bands)


def decontaminate_neardup(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    num: int = 1,
    den: int = 5,
) -> DataFrame:
    """Near-duplicate decontamination: per train doc, how many benchmark
    docs it LSH-collides with and how many of those survive the exact
    shingle-Jaccard verify (``inter*den >= num*uni``, i.e. J >= num/den —
    integer math, no float-boundary ambiguity across engines).

    The near-dup counterpart of curation.contaminated_ids (exact 5-gram
    containment): LSH recall catches paraphrase-level leaks that exact
    gram matching misses. Ids must be disjoint across the two frames (they
    are two slices/snapshots of one id space in the intended use).

    Pipeline: minhash both sides (one groupBy-free projection each) →
    banded cross join (benchmark side broadcast-small) → exact verify paid
    only on candidates (``jaccard_verify_pairs``). Returns
    (id, n_candidates, n_confirmed, max_inter).
    """
    sig_l = minhash_signatures_inline(
        train, id_col, text_col, k=k, num_hashes=num_hashes
    )
    sig_r = minhash_signatures_inline(
        bench, id_col, text_col, k=k, num_hashes=num_hashes
    )
    cand = minhash_lsh_candidates_cross(
        sig_l, sig_r, id_col, num_hashes=num_hashes, bands=bands
    )
    corpus = train.select(F.col(id_col), F.col(text_col)).unionByName(
        bench.select(F.col(id_col), F.col(text_col))
    )
    ver = jaccard_verify_pairs(corpus, cand, id_col, text_col, k=k)
    return ver.groupBy(F.col("id_a").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(
            (F.col("inter") * den >= num * F.col("uni")).cast("long")
        ).alias("n_confirmed"),
        F.max("inter").alias("max_inter"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 100,
) -> DataFrame:
    """Exact n-gram-set Jaccard similarity for pairs sharing a rare gram.

    Inverted-index self-join: explode shingles → (optionally) drop grams
    with document-frequency > max_df (common-gram suppression — bounds the
    per-gram fan-out that makes naive token joins quadratic) → pair docs
    sharing a surviving gram → |∩| by counting shared grams → |∪| from
    per-doc set sizes. Jaccard computed on FULL set sizes, so max_df only
    prunes the candidate space, not the similarity definition... with the
    caveat that a pair sharing *only* ultra-common grams is not emitted —
    the deliberate scalability trade (documented contract: recall on pairs
    that share ≥1 rare gram).
    """
    # Per-doc shingle-set dedup is row-local (array_distinct), NOT a global
    # distinct() — the set lives within one document, so no shuffle is
    # needed to build it; set sizes likewise come from the array before the
    # explode. Saves two full shuffles of the exploded index.
    staged = with_shingle_array(fan_out(df), text_col, "__sh_raw", k)
    base = _materialize(
        staged.select(
            F.col(id_col), F.array_distinct("__sh_raw").alias("__sh_arr")
        )
    )
    sh = base.select(F.col(id_col), F.explode("__sh_arr").alias("shingle"))
    sizes = base.select(F.col(id_col), F.size("__sh_arr").alias("set_size"))
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_fingerprint(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """SimHash: sign-aggregate token-hash bits into one integer per doc.

    Per token, bit j of its 40-bit hash votes +1/-1; the fingerprint sets
    bit j where the vote sum is positive. All bit math is ``shiftright`` /
    ``% 2`` native exprs aggregated in one groupBy (40 effective bits from
    the portable hash; ``bits`` capped accordingly).
    """
    bits = min(bits, 40)
    toks = tokenize(df.select(id_col, text_col), text_col)
    # stage the token hash once: as an inline subexpression it would be
    # recomputed per vote column (bits× md5 per token)
    hashed = toks.withColumn("__h", hashing.md5_long(F.col("token")))
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("__h"), j) % 2 == 1, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(bits)
        ]
    )
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else (fp + term)
    return votes.select(F.col(id_col), fp.cast("long").alias("simhash"))


def _hyperplane_bucketed(
    emb: DataFrame, vec_col: str, bucket_planes: int, seed: int
) -> DataFrame:
    """Stage (…, __bucket, __nrm): random-hyperplane sign bucket plus the
    per-vector norm, materialized once — the shared recall stage of
    embedding_near_dupes (self-join) and embedding_neardup_cross
    (two-sided), so both bucket bit-identically."""
    from .similarity import norm_expr  # local import to avoid cycle

    # the per-plane signed fold below is dim × planes expression work per
    # row — spread a 1-task scan before it (round 17)
    emb = fan_out(emb)

    dim_idx = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)

    def plane_sign(p: int):
        # Closure factory, NOT `lambda i, p=p`: pyspark dispatches on lambda
        # ARITY, so a two-parameter lambda (even with a default) is compiled
        # as the binary (element, index) form — the "seed" parameter would be
        # silently rebound to the array index at runtime, collapsing every
        # plane to the same sign pattern (caught by the q29 value oracle).
        def f(i):
            return (
                hashing.md5_long(F.concat_ws(":", F.lit(seed), F.lit(p), i)) % 2
            ) * 2 - 1

        return f

    sig_bits = []
    for p in range(bucket_planes):
        # deterministic pseudo-random ±1 per (plane, dim): parity of md5
        signed = F.zip_with(
            F.col(vec_col), F.transform(dim_idx, plane_sign(p)), lambda v, s: v * s
        )
        dot = F.aggregate(signed, F.lit(0.0), lambda acc, x: acc + x)
        sig_bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))
    bucket = F.concat_ws("", *[b.cast("string") for b in sig_bits])
    # stage the per-vector norm once (same float bits as cosine_expr, which
    # would recompute both norms per PAIR inside the verify — the q76
    # staged-norm lesson); the checkpoint materializes it physically
    return _materialize(
        emb.withColumn("__bucket", bucket).withColumn(
            "__nrm", norm_expr(F.col(vec_col))
        )
    )


def embedding_neardup_cross(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bucket_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Cross-corpus cosine near-duplicates: left (train) × right (bench)
    pairs sharing a hyperplane bucket, exact-cosine verified — q119's
    embedding-modality twin (token shingles can't see a paraphrase that an
    embedding places next to a benchmark item). Same ``_hyperplane_bucketed``
    recall stage as the self-join variant, no id ordering (sides are
    semantically different; id_a is always left). The bench side is
    eval-suite-sized, so its bucketed frame broadcasts and the train
    corpus never shuffles.
    """
    from .similarity import dot_expr  # local import to avoid cycle

    a = _hyperplane_bucketed(left, vec_col, bucket_planes, seed).alias("a")
    b = _hyperplane_bucketed(right, vec_col, bucket_planes, seed).alias("b")
    return (
        a.join(b, F.col("a.__bucket") == F.col("b.__bucket"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (
                dot_expr(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
                / (F.col("a.__nrm") * F.col("b.__nrm"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dupes(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bucket_planes: int = 8,
    seed: int = 7,
    link: str = "all",
) -> DataFrame:
    """Cosine near-duplicate pairs over embeddings, LSH-bucketed.

    Random-hyperplane signs (deterministic per-dimension ±1 pattern derived
    from the portable hash) bucket vectors; exact cosine verifies within a
    bucket. Near-identical vectors agree on all sign bits, so recall at
    thresholds ≳0.9 is high while the join touches only same-bucket pairs.

    ``link``:
      - ``"all"``: every qualifying pair. Output (and work) is QUADRATIC in
        duplicate-class size — measured 13× wall-time for 4× data once
        clone classes grew past ~10 members. Right for analytics on
        modest-duplication corpora; wrong at 100 TB.
      - ``"star"``: each bucket member pairs only with its bucket's min-id
        vector — O(class) links instead of O(class²), enough to recover
        full duplicate clusters downstream via connected components
        (id_a is the bucket representative). The scale path.
    """
    from .similarity import dot_expr  # local import to avoid cycle

    bucketed = _hyperplane_bucketed(emb, vec_col, bucket_planes, seed)
    if link == "star":
        from pyspark.sql import Window

        w = Window.partitionBy("__bucket")
        reps = (
            bucketed.withColumn("__rep", F.min(id_col).over(w))
            .filter(F.col(id_col) == F.col("__rep"))
            .select(
                F.col("__bucket"),
                F.col(id_col).alias("id_a"),
                F.col(vec_col).alias("__rvec"),
                F.col("__nrm").alias("__rnrm"),
            )
        )
        return (
            bucketed.join(reps, "__bucket")
            .filter(F.col(id_col) > F.col("id_a"))
            .select(
                "id_a",
                F.col(id_col).alias("id_b"),
                (
                    dot_expr(F.col(vec_col), F.col("__rvec"))
                    / (F.col("__nrm") * F.col("__rnrm"))
                ).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (
                dot_expr(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
                / (F.col("a.__nrm") * F.col("b.__nrm"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def jaccard_verify_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    broadcast_candidates: bool | None = None,
    extra_arrays: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for an explicit candidate-pair list.

    The verification half of the LSH pipeline: candidates come from a
    recall stage (banded MinHash, SimHash radius, embedding buckets …) and
    only those pairs pay the exact set comparison. The corpus is first
    semi-join-reduced to the ids that appear in any pair; when that id set
    is small (the point of LSH) the semi-join broadcasts and the corpus is
    scanned once but never shuffled.

    ``broadcast_candidates``: ``None`` (default) leaves the strategy to
    Catalyst/AQE — on a high-duplication corpus with ``link="all"`` the
    candidate-id set can approach corpus size, and a forced broadcast
    there risks driver/executor OOM, so AQE's stats-based choice (broadcast
    when small, shuffled semi-join when not) is the scale-safe default.
    ``True`` forces the broadcast hint for callers that KNOW the pair list
    is bounded (e.g. a star-linked candidate set capped upstream).

    Output: (id_a, id_b, inter, uni, jaccard). ``inter``/``uni`` are exact
    integers so callers can threshold with integer math (inter*den >=
    num*uni) — no float-boundary ambiguity across engines.
    """
    base = _materialize(
        with_shingle_array(df, text_col, "__jv_raw", k).select(
            F.col(id_col).alias("__jv_id"),
            F.array_distinct("__jv_raw").alias("__jv_arr"),
        )
    )
    if extra_arrays is not None:
        # pre-shingled rows for a STATIC side (see shingle_arrays): ids
        # must be disjoint from df's — stage once, reuse every call
        base = base.unionByName(extra_arrays)
    needed = (
        pairs.select(F.col("id_a").alias("__jv_id"))
        .unionByName(pairs.select(F.col("id_b").alias("__jv_id")))
        .distinct()
    )
    if broadcast_candidates:
        needed = F.broadcast(needed)
    sub = base.join(needed, "__jv_id", "left_semi")
    a = sub.select(
        F.col("__jv_id").alias("id_a"), F.col("__jv_arr").alias("__arr_a")
    )
    b = sub.select(
        F.col("__jv_id").alias("id_b"), F.col("__jv_arr").alias("__arr_b")
    )
    inter = F.size(F.array_intersect("__arr_a", "__arr_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("inter", inter.cast("long"))
        .withColumn(
            "uni",
            (F.size("__arr_a") + F.size("__arr_b") - F.col("inter")).cast("long"),
        )
        .select(
            "id_a",
            "id_b",
            "inter",
            "uni",
            F.when(F.col("uni") > 0, F.col("inter") / F.col("uni"))
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
        )
    )


def shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Materialized (__jv_id, __jv_arr) distinct-shingle rows in
    ``jaccard_verify_pairs``' internal shape — stage a STATIC side once
    and pass as ``extra_arrays`` so per-batch verification doesn't
    re-shingle it every call."""
    return _materialize(
        with_shingle_array(df, text_col, "__jv_raw", k).select(
            F.col(id_col).alias("__jv_id"),
            F.array_distinct("__jv_raw").alias("__jv_arr"),
        )
    )


def dedup_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold_num: int = 1,
    threshold_den: int = 2,
    link: str = "all",
) -> DataFrame:
    """End-to-end near-dup dedup: MinHash signatures → banded LSH
    candidates → exact-Jaccard verification → connected components →
    cluster representative (min id). The full 100 TB dedup path in one
    call: every stage is bucketed/banded/broadcast — the corpus itself
    never shuffles, and no stage is all-pairs.

    Pairs with jaccard >= threshold_num/threshold_den (integer compare —
    exact at the boundary on any engine) become edges; transitively linked
    docs form one cluster whose representative is the minimum id.

    ``link``: "all" verifies every within-bucket pair (exact semantics,
    SQL-oracle-checkable, candidate volume quadratic in duplicate-class
    size); "star" verifies each member against its bucket representative
    only (candidate volume linear in class size — the high-duplication /
    100 TB setting; contract: a doc joins a cluster iff it passes the
    Jaccard test against a bucket representative, so chains of pairwise-
    similar-but-rep-dissimilar docs may split). See minhash_lsh_candidates.

    Output: (id, cluster_rep) for every input row; non-duplicated docs are
    their own representative.
    """
    from .components import connected_components

    sig = minhash_signatures_inline(
        df, id_col, text_col, k=k, num_hashes=num_hashes
    )
    cand = minhash_lsh_candidates(
        sig, id_col, num_hashes=num_hashes, bands=bands, link=link
    )
    ver = jaccard_verify_pairs(df, cand, id_col, text_col, k=k)
    edges = ver.filter(
        (F.col("uni") > 0)
        & (F.col("inter") * threshold_den >= threshold_num * F.col("uni"))
    ).select("id_a", "id_b")
    comp = connected_components(edges)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("comp", "id").alias("cluster_rep"),
        )
    )


def bloom_params(n: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n·ln(fpp)/ln²2 bits (rounded up to a
    64-bit word multiple), k = (m/n)·ln2 probes."""
    import math

    n = max(n, 64)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def bloom_hash_pair(text_col: str):
    """The two independent md5 hashes Kirsch-Mitzenmacher double hashing
    derives every probe position from. One definition shared by the batch
    operator, the streaming ingest twin, and the q72 oracle."""
    key = hashing.md5_long(normalize_text(text_col))
    key2 = hashing.md5_long(F.concat(normalize_text(text_col), F.lit("#b2")))
    return key, key2


def _positions(pairs: DataFrame, m: int, k: int, keep: list[str]) -> DataFrame:
    """Explode k probe positions per (__h1, __h2) pair → (__word, __mask),
    carrying the ``keep`` columns through (the probe keeps the pair itself
    to key its verdict; the build keeps nothing)."""
    return (
        pairs.select(
            "__h1",
            "__h2",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__i"),
        )
        .select(
            *keep,
            F.pmod(F.col("__h1") + F.col("__i") * F.col("__h2"), F.lit(m)).alias(
                "__pos"
            ),
        )
        .select(
            *keep,
            (F.col("__pos") / 64).cast("int").alias("__word"),
            # pyspark's F.shiftleft only takes a literal shift; the SQL
            # form accepts a column
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))"
            ).alias("__mask"),
        )
    )


def bloom_word_rows(pairs: DataFrame, m: int, k: int) -> DataFrame:
    """Sketch build: (__h1, __h2) pairs → aggregated (__word, __bits) rows.

    ONE map-side-combined shuffle; the result is the sharded sketch TABLE
    (m/64 rows max) — partitionable, persistable per corpus version,
    never single-row or driver-side state."""
    return (
        _positions(pairs, m, k, keep=[])
        .groupBy("__word")
        .agg(F.bit_or("__mask").alias("__bits"))
    )


def bloom_sketch_merge(
    sketch: DataFrame | None, new_pairs: DataFrame, m: int, k: int
) -> DataFrame:
    """Incrementally fold new content pairs into an existing sketch table:
    union + one bit_or re-aggregation over at most m/64 + new rows. This
    is what makes ingest INCREMENTAL — the corpus is never rescanned; the
    sketch table is the only state that updates per batch."""
    words = bloom_word_rows(new_pairs, m, k)
    if sketch is None:
        return words
    return (
        sketch.unionByName(words)
        .groupBy("__word")
        .agg(F.bit_or("__bits").alias("__bits"))
    )


def bloom_probe(sketch: DataFrame, pairs: DataFrame, m: int, k: int) -> DataFrame:
    """Probe: distinct (__h1, __h2) pairs → the subset that are bloom
    hits, as (__h1, __h2, bloom_hit=True) rows.

    INNER join on the word index: a probe whose word is absent from the
    sketch is an unset bit, which the count-of-set == k verdict already
    treats as a miss — and inner (unlike left-outer) lets AQE broadcast
    whichever side is small."""
    probes = _positions(pairs, m, k, keep=["__h1", "__h2"])
    return (
        probes.join(sketch, "__word", "inner")
        .groupBy("__h1", "__h2")
        .agg(
            F.sum(
                ((F.col("__bits").bitwiseAND(F.col("__mask"))) != 0).cast("int")
            ).alias("__n_set")
        )
        .filter(F.col("__n_set") == k)
        .select("__h1", "__h2", F.lit(True).alias("bloom_hit"))
    )


def bloom_incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    expected_corpus_rows: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Incremental ingest dedup: classify a NEW batch against an existing
    corpus without an exact join for every batch row.

    The streaming-ingest problem at 100 TB: every arriving batch must be
    checked against billions of already-ingested documents, but an exact
    anti-join shuffles (at least the semi-join keys of) the whole corpus
    for every batch. Standard fix: a Bloom filter over the corpus's
    normalized-text hashes. Spark's internal bloom sketch is not exposed
    to SQL/Python in this build, and an engine-specific sketch would be
    unverifiable anyway — so the filter is built from the engine-portable
    md5 family (functions/hashing.py) as plain relational state:

      build:  per corpus row, k = ``bloom_params`` probe positions via
              Kirsch-Mitzenmacher double hashing (h1 + i·h2 mod m);
              explode → (word, or-mask) → ``bit_or`` groupBy — ONE
              map-side-combined shuffle producing the SHARDED sketch
              TABLE of m/64 ``(word, bits)`` rows. The sketch never
              collapses to driver-side or single-row state: at n=10⁹,
              fpp=0.01 it is ~1.5×10⁸ rows (~2.4 GB) — partitionable,
              and in production persisted per corpus version bucketed
              by ``__word`` so per-batch probes never reshuffle it.
              Rebuilds are one corpus scan, never a corpus shuffle.
      probe:  per DISTINCT batch hash-pair, explode the k word indexes
              and inner-equi-join the sketch table on ``__word``; a pair
              is a ``bloom_hit`` iff all k probes land on a present word
              with its bit set (count-of-set == k, so words absent from
              the sketch correctly read as unset bits). Inner join keeps
              BOTH broadcast directions open to AQE: tiny sketch →
              broadcast sketch; huge sketch + small batch → broadcast
              the k·|distinct batch| probe rows. Only 16-byte hash
              pairs of the batch ever shuffle, never its payload rows.
      verify: only ``bloom_hit`` candidates (true dups + ~fpp false
              positives) pay the exact confirmation semi-join, so the
              join input is |dups| + fpp·|batch|, not |batch|.

    Every bit is a deterministic function of md5 — the DuckDB oracle
    reproduces the filter bit-for-bit (q72), unlike an engine-native
    sketch (contrast q38 HLL).

    Output: batch rows + ``bloom_hit`` (probe verdict) + ``is_dup``
    (exact). NULL/unhashable text rows get ``bloom_hit = is_dup = False``
    (a NULL key equi-joins nothing, so they are definitionally new).
    Invariants pinned by tests: ``is_dup ⇒ bloom_hit`` (no false
    negatives), ``is_dup`` equals the exact anti-join truth, and the
    false-positive excess ``bloom_hit ∧ ¬is_dup`` stays near fpp·|batch|.
    """
    if expected_corpus_rows is None:
        # one extra count job; callers at scale pass the known row count
        expected_corpus_rows = corpus.count()
    m, k = bloom_params(expected_corpus_rows, fpp)
    key, key2 = bloom_hash_pair(text_col)
    ckeys = _materialize(
        corpus.select(key.alias("__h1"), key2.alias("__h2"))
    )
    # materialized: the sketch is consumed by the probe join and, without
    # a checkpoint, every downstream consumer would re-execute the whole
    # build sub-DAG including its exchange. m/64 (word, bits) rows stay a
    # TABLE -- sharded, partitionable -- never a single-row map or a
    # driver-side structure; this is the representation that survives
    # 10^9-row corpora (the production analogue persists it per corpus
    # version, bucketed by __word; streaming/events.bloom_ingest_stream
    # maintains exactly that persisted table incrementally).
    sketch = _materialize(bloom_word_rows(ckeys, m, k))
    # the probe and confirm verdicts are keyed on the TEXT-HASH pair, not
    # the id: is_dup is a property of the content, and a batch repeating
    # an id with different texts (retry + edit) must get per-row verdicts.
    # Distinct pairs cannot fan out the join back (each batch row carries
    # exactly one pair), and shrink probe volume to k*|distinct texts|.
    bkeys = (
        batch.select(key.alias("__h1"), key2.alias("__h2"))
        .filter(F.col("__h1").isNotNull())
        .distinct()
    )
    # materialized: ``hits`` feeds both the confirm semi-join and the
    # verdict join back to the batch; without the checkpoint the probe
    # join + aggregate would re-execute per consumer. |bloom-hit pairs| =
    # |dups| + ~fpp*|batch| rows of two longs -- the checkpoint is free.
    hits = _materialize(bloom_probe(sketch, bkeys, m, k))
    confirmed = (
        hits.select("__h1", "__h2")
        .join(ckeys.select("__h1", "__h2").distinct(), ["__h1", "__h2"], "left_semi")
        .withColumn("is_dup", F.lit(True))
    )
    verdict = hits.join(confirmed, ["__h1", "__h2"], "left")
    return (
        batch.withColumn("__h1", key)
        .withColumn("__h2", key2)
        .join(verdict, ["__h1", "__h2"], "left")
        .withColumn("bloom_hit", F.coalesce("bloom_hit", F.lit(False)))
        .withColumn("is_dup", F.coalesce("is_dup", F.lit(False)))
        .drop("__h1", "__h2")
    )


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster, then near-dup only
    WITHIN clusters (Abbas et al. 2023, "SemDeDup").

    Spherical k-means (deterministic: hash-minimal init, explicit tie
    rules — similarity.kmeans_centroids) partitions the corpus; each
    vector then checks for a same-cluster neighbor with smaller id whose
    cosine ≥ threshold. The keep-first (min-id) rule makes survivors
    deterministic, so the whole pipeline — training rounds included — is
    value-checked against a round-unrolled DuckDB oracle (q76).

    Scale posture: this is the production answer to "near-dedup 100 TB of
    embeddings without an all-pairs join". Assignment is shuffle-free
    (broadcast argmax); the pair search shuffles once on centroid_id and
    compares only within-cluster pairs, O(Σ cᵢ²) instead of O(n²). The
    operating lever is k ∝ corpus size (SemDeDup uses n/k ≈ 1e3-1e4
    members per cluster), which bounds cᵢ and keeps per-task pair work
    flat; hot clusters beyond that are AQE skew-join territory. Output:
    every input id with (centroid_id, is_dup) — callers filter
    ``~is_dup`` for the surviving corpus.
    """
    from .similarity import assign_centroids, dot_expr, kmeans_centroids, norm_expr

    cents = kmeans_centroids(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    # the vector NORM is staged as a materialized column: inside the
    # within-cluster pair filter, cosine_expr would recompute both sides'
    # norms (64 mults + sum + sqrt each) PER PAIR — ~3× the per-pair math
    # for values that are per-VECTOR constants. Same float bits (the sqrt
    # is just computed once), measured ~2× on the q76 bench; the
    # checkpoint physically materializes the column so CollapseProject
    # cannot re-inline it into the pair filter.
    assigned = _materialize(
        assign_centroids(emb, cents, id_col, vec_col)
        .select(id_col, vec_col, "centroid_id")
        .withColumn("__nrm", norm_expr(F.col(vec_col)))
    )
    a = assigned.alias("a")
    b = assigned.select(
        F.col(id_col).alias("__bid"),
        F.col(vec_col).alias("__bvec"),
        F.col("centroid_id").alias("__bcent"),
        F.col("__nrm").alias("__bnrm"),
    ).alias("b")
    dups = (
        a.join(
            b,
            (F.col("centroid_id") == F.col("__bcent"))
            & (F.col("__bid") < F.col(id_col)),
        )
        .filter(
            dot_expr(F.col(vec_col), F.col("__bvec"))
            / (F.col("__nrm") * F.col("__bnrm"))
            >= threshold
        )
        .select(id_col)
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return (
        assigned.join(dups, id_col, "left")
        .select(
            id_col,
            "centroid_id",
            F.coalesce("__dup", F.lit(False)).alias("is_dup"),
        )
    )


def setsim_prefix_len(threshold: float, n_col) -> "F.Column":
    """PPJoin prefix length L = n - ⌈t·n⌉ + 1 on the EXACT product.

    The raw double t*n can land one ulp ABOVE an integer value
    (0.07 * 100 = 7.000000000000001), and ceil of that overshoots by 1 —
    a prefix one element SHORTER than the theorem requires, i.e. silent
    false negatives in an operator whose whole contract is "exact, no
    false negatives". Rounding to 9 decimals first snaps the product back
    onto its lattice (shingle-set sizes are far below 1e9, so a true
    non-integer t·n is never within 1e-9 of an integer for any threshold
    written with ≤ 9 decimals). Mirrored verbatim in the q91 oracle SQL
    (``ceil(round(t * n, 9))``). Pinned against exact Fraction arithmetic
    in tests/test_properties.py.
    """
    n = F.col(n_col) if isinstance(n_col, str) else n_col
    return (n - F.ceil(F.round(F.lit(threshold) * n, 9)) + 1).cast("int")


def setsim_join_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    k: int = 3,
) -> DataFrame:
    """EXACT set-similarity self-join with prefix filtering (the
    PPJoin/AllPairs family, Chaudhuri et al. 2006 / Xiao et al. 2008) —
    the exact-result counterpart to MinHash-LSH: every pair of documents
    whose ``k``-shingle-set Jaccard ≥ ``threshold``, no false negatives
    and no sketch approximation. Shingle sets (not unigram token sets)
    are the near-dup contract: documents drawn from one vocabulary share
    most TOKENS while sharing almost no 3-shingles unless passages
    actually repeat (the q23/q25 granularity).

    Prefix principle: order every document's distinct shingles by global
    rarity; two sets with Jaccard ≥ t MUST share an element among each
    one's first |d| - ⌈t·|d|⌉ + 1 rarest. So only prefix shingles are
    indexed, and candidates are pairs sharing a prefix shingle —
    rare-shingle buckets, tiny by construction (the boilerplate shingles
    that would explode a naive join are exactly the ones prefixes
    exclude).

    Rarity order is (document-frequency asc, shingle asc) — a total
    order, no dense rank materialization: documents sort their own
    (df, shingle) structs row-locally (array_sort), so there is NO
    global vocab sort. Shuffles: shingle df count, per-doc collect,
    prefix pair join, pair distinct — all partial-agg'd/bucketed; never
    all-pairs. Verification is exact: |A∩B| via array_intersect of the
    full sorted shingle arrays (integer arithmetic — the Jaccard is a
    ratio of exact ints, cross-engine safe by construction).

    Output: (id_a, id_b, inter, n_a, n_b, jaccard) with id_a < id_b,
    jaccard ≥ threshold, rounded to 6 decimals.
    """
    staged = with_shingle_array(fan_out(df), text_col, "__ss_arr", k)
    tok = staged.select(
        F.col(id_col),
        F.explode(F.array_distinct("__ss_arr")).alias("__t"),
    ).filter(F.length("__t") > 0)
    dfreq = tok.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    # per-doc tokens in global-rarity order, assembled row-locally
    docs = _materialize(
        tok.join(dfreq, "__t")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__df"), F.col("__t")))
            ).alias("__pairs")
        )
        .select(
            F.col(id_col),
            F.transform("__pairs", lambda p: p["__t"]).alias("__set"),
            F.size("__pairs").alias("__n"),
        )
        .withColumn("__L", setsim_prefix_len(threshold, "__n"))
    )
    prefix = docs.select(
        F.col(id_col),
        F.explode(F.slice("__set", 1, F.col("__L"))).alias("__t"),
    )
    a = prefix.select(F.col(id_col).alias("id_a"), "__t")
    b = prefix.select(F.col(id_col).alias("id_b"), "__t")
    cand = (
        a.join(b, "__t")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    da = docs.select(
        F.col(id_col).alias("id_a"),
        F.col("__set").alias("__sa"),
        F.col("__n").alias("n_a"),
    )
    db = docs.select(
        F.col(id_col).alias("id_b"),
        F.col("__set").alias("__sb"),
        F.col("__n").alias("n_b"),
    )
    verified = (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .withColumn("inter", F.size(F.array_intersect("__sa", "__sb")).cast("long"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select(
        "id_a",
        "id_b",
        "inter",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "jaccard",
    )


def containment_join_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    k: int = 3,
    hot_gram_chunk: int = 1024,
) -> DataFrame:
    """EXACT set-CONTAINMENT self-join: every ordered pair (a, b) with
    |Sₐ ∩ S_b| / |Sₐ| ≥ threshold over k-shingle sets — the asymmetric
    relation Jaccard misses by construction: a paragraph quoted inside a
    10× longer document has tiny Jaccard but containment ≈ 1, and
    quote/subset detection is exactly what benchmark-contamination and
    license-compliance sweeps need (Lee et al. 2022 dedup the
    symmetric case; contamination scans need this directed one).

    Prefix principle, containment flavor: order shingles by global
    rarity (the q91/setsim discipline). If A's first
    |A| − ⌈t·|A|⌉ + 1 rarest shingles were ALL absent from B, then
    A ∩ B fits inside A's remaining ⌈t·|A|⌉ − 1 shingles —
    contradicting |A∩B| ≥ t·|A|. So candidates are A-prefix shingles
    joined against B's FULL shingle list (the asymmetry is physical:
    only the probing side gets a prefix; the indexed side must be
    complete or true pairs are lost). That makes the candidate fanout
    Σ_g df_prefix(g)·df(g) — rarity ordering keeps prefix grams rare,
    but the indexed side cannot be truncated (exactness), so one gram
    appearing in 30% of documents puts ~0.3·n rows on ONE join key.

    Hot-gram skew is handled by EXACT posting-list chunking, not AQE
    hope: a gram with df > ``hot_gram_chunk`` has its B-side posting
    list split into ⌈df/chunk⌉ sub-keys (chunk = pmod(hash(id_b),
    n_chunks)) and each A-probe of that gram replicates across the
    sub-keys (explode over sequence) — every (a, b) pair still meets on
    exactly one (gram, chunk) key, so the candidate set is PROVABLY
    identical (property-tested: forced chunking ≡ unchunked), while no
    join key carries more than ~chunk indexed rows. The hot-gram list
    is |grams with df > chunk| ≤ total_occurrences/chunk — broadcast
    scale by construction, so both sides are augmented map-side: the
    mitigation adds ZERO shuffles, only replicated probe rows for the
    hot grams (bounded by Σ_hot df_prefix(g)·⌈df(g)/chunk⌉ extra rows).
    SCALE.md (round-10 containment-skew curve) measures the knee this
    removes.

    Verification is exact integer arithmetic (array_intersect of the
    full sorted sets / |A|), rounded to 6 for the cross-engine lattice.
    Self-pairs are excluded; both directions of a mutual containment
    emit separately (the relation is directed).

    Output: (id_a, id_b, inter, n_a, n_b, containment) with
    containment(a→b) = |Sₐ∩S_b|/|Sₐ| ≥ threshold, id_a ≠ id_b.
    """
    staged = with_shingle_array(fan_out(df), text_col, "__ss_arr", k)
    tok = staged.select(
        F.col(id_col),
        F.explode(F.array_distinct("__ss_arr")).alias("__t"),
    ).filter(F.length("__t") > 0)
    dfreq = tok.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    docs = _materialize(
        tok.join(dfreq, "__t")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__df"), F.col("__t")))
            ).alias("__pairs")
        )
        .select(
            F.col(id_col),
            F.transform("__pairs", lambda p: p["__t"]).alias("__set"),
            F.size("__pairs").alias("__n"),
        )
        .withColumn("__L", setsim_prefix_len(threshold, "__n"))
    )
    prefix_a = docs.select(
        F.col(id_col).alias("id_a"),
        F.explode(F.slice("__set", 1, F.col("__L"))).alias("__t"),
    )
    full_b = docs.select(
        F.col(id_col).alias("id_b"), F.explode("__set").alias("__t")
    )
    # posting-list chunking for hot grams (docstring): split each hot
    # gram's indexed rows into ⌈df/chunk⌉ sub-keys, replicate its probes
    hot = dfreq.filter(F.col("__df") > hot_gram_chunk).select(
        "__t",
        F.ceil(F.col("__df") / F.lit(hot_gram_chunk))
        .cast("int")
        .alias("__nch"),
    )
    b_side = (
        full_b.join(F.broadcast(hot), "__t", "left")
        .withColumn(
            "__c",
            F.when(
                F.col("__nch").isNotNull(),
                F.pmod(F.hash("id_b"), F.col("__nch")),
            ).otherwise(F.lit(0)),
        )
        .drop("__nch")
    )
    a_side = (
        prefix_a.join(F.broadcast(hot), "__t", "left")
        .select(
            "id_a",
            "__t",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("__nch"), F.lit(1)) - 1)
            ).alias("__c"),
        )
    )
    cand = (
        a_side.join(b_side, ["__t", "__c"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    da = docs.select(
        F.col(id_col).alias("id_a"),
        F.col("__set").alias("__sa"),
        F.col("__n").alias("n_a"),
    )
    db = docs.select(
        F.col(id_col).alias("id_b"),
        F.col("__set").alias("__sb"),
        F.col("__n").alias("n_b"),
    )
    verified = (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .withColumn(
            "inter", F.size(F.array_intersect("__sa", "__sb")).cast("long")
        )
        .withColumn(
            "containment",
            F.round(F.col("inter").cast("double") / F.col("n_a"), 6),
        )
        .filter(F.col("containment") >= threshold)
    )
    return verified.select(
        "id_a",
        "id_b",
        "inter",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "containment",
    )


def keep_best_representative(
    df: DataFrame,
    id_col: str,
    text_col: str,
    quality,
    **dedup_kwargs,
) -> DataFrame:
    """Quality-aware representative selection: within each near-dup
    cluster keep the HIGHEST-quality member instead of the min-id one —
    the curation policy real pipelines use (RefinedWeb keeps the longest
    page of a dup family; quality-classifier pipelines keep the
    best-scoring), because which copy survives matters as much as
    deduplicating at all: boilerplate-stripped originals beat mirrored
    scrapes with navigation chrome.

    ``quality`` is any Column over ``df`` (token count, gopher score,
    classifier probability — caller's policy). Clusters come from the
    full LSH → exact-verify → connected-components pipeline
    (dedup_corpus); the selection is one window over the cluster key with
    (quality desc, id asc) order — deterministic under ties. The rank-1
    filter plans as WindowGroupLimit (plan-pinned), so map tasks pre-prune
    to one candidate per cluster BEFORE the exchange; cluster_size comes
    from a partial-aggregated groupBy on the SAME key, deliberately NOT a
    count() over the window — a full-partition window function in the
    same spec disables the group-limit pruning, putting every cluster
    member back on the exchange.

    Output: one row per cluster — (id, cluster_rep, cluster_size,
    quality), the surviving document and how many it speaks for (the
    weight a dedup-aware sampler feeds to upsample_by_weight).
    """
    from pyspark.sql import Window

    clusters = _materialize(dedup_corpus(df, id_col, text_col, **dedup_kwargs))
    scored = df.select(F.col(id_col), quality.alias("quality"))
    j = clusters.join(scored, id_col)
    w = Window.partitionBy("cluster_rep").orderBy(
        F.col("quality").desc(), F.col(id_col).asc()
    )
    sizes = clusters.groupBy("cluster_rep").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .join(sizes, "cluster_rep")
        .select(id_col, "cluster_rep", "cluster_size", "quality")
    )


def editdist1_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
) -> DataFrame:
    """All pairs of rows whose strings are within Levenshtein distance 1,
    via SymSpell-style deletion neighborhoods — never the n² cross join.

    The reference's dedup surface is exact-key only (sqlite INSERT OR
    REPLACE / IGNORE, src/import_synteny_blocks.py:83-88); typo-level
    near-keys (one wrong character in an ID or name) are the next class a
    curation pipeline meets. Blocking identity (Garbe's SymSpell): for
    edit distance ≤ 1, two strings match iff their deletion neighborhoods
    intersect, where neighborhood(s) = {s} ∪ {s minus one character}.
      - ed 0: share s itself;
      - substitution at i: both sides' delete-at-i collide;
      - insert/delete: the longer string's delete-at-i IS the shorter.
    The neighborhood is |s|+1 variants — generated JVM-side with
    sequence → transform → substring concat (no UDF), exploded, and
    self-joined on the variant string. That join's key cardinality is
    Σ|s| (linear in corpus size), each key carrying only the strings one
    deletion away from a shared form — the same posting-list discipline
    as every other blocked join in this module. The candidate set is a
    superset (e.g. "ab"/"ba" share deletions "a","b" but are ed 2), so
    pairs are distinct-ed and verified with one levenshtein call — exact
    by construction, candidates-only by blocking.

    At 100 TB: neighborhood explode is map-side (row → |s|+1 rows), the
    variant join shuffles Σ|s| short strings, and hot variants (a common
    short name) are ordinary AQE skew-join territory. Strings here are
    IDs/names (tens of chars); for document-scale text use the shingle
    pipelines above — deletion blocking is for short keys.

    Output: (id_a, id_b, name_a, name_b, dist), id_a < id_b.
    """
    pos = F.sequence(F.lit(0), F.length(str_col))
    variants = F.transform(
        pos,
        lambda i: F.when(i == F.length(str_col), F.col(str_col)).otherwise(
            F.concat(
                F.substring(F.col(str_col), F.lit(1), i),
                F.col(str_col).substr(
                    i + F.lit(2), F.length(str_col) - i - F.lit(1)
                ),
            )
        ),
    )
    # neighborhood explode is |s|+1 substring builds per row — spread a
    # 1-task scan before it (round 17); the self-join shuffle follows
    nbhd = fan_out(df).select(
        F.col(id_col).alias("__id"),
        F.col(str_col).alias("__s"),
        F.explode(F.array_distinct(variants)).alias("__v"),
    )
    cand = (
        nbhd.alias("a")
        .join(nbhd.alias("b"), "__v")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__s").alias("name_a"),
            F.col("b.__s").alias("name_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "dist", F.levenshtein("name_a", "name_b").cast("int")
    ).filter(F.col("dist") <= 1)


def repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    exact: bool = True,
) -> DataFrame:
    """Exact repeated-substring span finder — the suffix-array-style pass
    production LLM pipelines run before training (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    token covered by SOME substring of ≥ k tokens that occurs ≥ 2 times
    anywhere in the corpus (other documents or the same one) is marked,
    and per document the marked positions are coalesced into maximal
    disjoint spans — exactly the regions that pass would excise.

    Identity making this distributable WITHOUT building a suffix array: a
    position is covered by a repeated substring of length ≥ k iff it is
    covered by a repeated k-token shingle (any repeated substring of
    length ≥ k contains a repeated k-shingle through each of its
    positions, and a repeated k-shingle IS such a substring). So the
    corpus-global problem reduces to counting fixed-width shingles —
    shuffle-friendly — plus per-document interval coalescing.

    Stages (all native Columns, no UDFs):
      1. tokenize (normalized whitespace split) and emit each document's
         k-shingles by position via ``transform(sequence(...), slice)`` —
         one row per (doc, pos), computed JVM-side from the token array;
      2. count occurrences per 64-bit shingle hash (8-byte shuffle keys,
         map-side partial aggregation) → the repeated-hash set;
      3. join positions back on the hash (equi-join; the non-repeated
         majority never shuffles a string) and, when ``exact=True``,
         confirm candidates by the shingle STRING (a window count over
         candidates only) so hash collisions cannot mark a false span;
      4. gaps-and-islands per document: consecutive marked positions
         whose k-windows touch (gap ≤ k) merge; one aggregation emits
         ``(id, span_start, span_end, span_tokens)``.

    ``exact=False`` skips stage 3's string confirmation — the standard
    production trade (a 64-bit collision among the corpus's distinct
    shingles is ~birthday-bounded: ~4e9 distinct shingles for a 50%
    chance of ONE false mark) — and is the 100 TB path: the shuffle then
    carries only (id, pos, hash). Span positions are 0-based token
    offsets, ``span_end`` inclusive.
    """
    from pyspark.sql import Window

    sh = shingle_positions(df, text_col, id_col, k)
    rep_h = (
        sh.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("__h")
    )
    cand = sh.join(rep_h, "__h")
    if exact:
        wc = Window.partitionBy("__sh")
        cand = cand.withColumn("__cs", F.count(F.lit(1)).over(wc)).filter(
            F.col("__cs") >= 2
        )
    return _coalesce_marked(cand.select(id_col, "pos"), id_col, k)


def shingle_positions(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """Every k-token shingle of every document as
    ``(id, pos, __sh string, __h xxhash64)`` — one row per window start,
    computed JVM-side from the token array (``transform`` over
    ``sequence`` + ``slice``, then ``posexplode``). The shared front end
    of ``repeated_spans`` / ``excise_repeated_spans`` and the streaming
    shingle-count fold; downstream column pruning drops ``__sh`` for
    hash-only consumers."""
    toks = fan_out(df).select(
        F.col(id_col), F.split(normalize_text(text_col), " ").alias("__toks")
    ).filter(F.size("__toks") >= k)
    return toks.select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(__toks) - {int(k)}),"
                f" i -> concat_ws(' ', slice(__toks, i + 1, {int(k)})))"
            )
        ).alias("pos", "__sh"),
    ).withColumn("__h", F.xxhash64("__sh"))


def repeated_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    exact: bool = True,
) -> DataFrame:
    """Per-document duplication profile over ``repeated_spans``: for EVERY
    input document, ``(id, n_tokens long, covered_tokens long,
    n_spans long, coverage_ratio double R6)`` — the doc-level
    memorization-risk signal a curation pass thresholds on ("drop docs
    more than X% covered by corpus-repeated substrings"). Zero-coverage
    docs report zeros; one aggregation over the spans plus one equi-join
    back to per-doc token counts."""
    spans = repeated_spans(df, text_col, id_col, k, exact)
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_tokens").alias("__cov"),
        F.count(F.lit(1)).alias("__ns"),
    )
    base = df.select(
        F.col(id_col),
        F.size(F.split(normalize_text(text_col), " "))
        .cast("long")
        .alias("n_tokens"),
    )
    return base.join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce(F.col("__cov"), F.lit(0)).cast("long").alias(
            "covered_tokens"
        ),
        F.coalesce(F.col("__ns"), F.lit(0)).cast("long").alias("n_spans"),
        F.round(
            F.coalesce(F.col("__cov"), F.lit(0)) / F.col("n_tokens"), 6
        ).alias("coverage_ratio"),
    )


def cross_repeated_spans(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    k: int = 13,
    exact: bool = True,
) -> DataFrame:
    """Substring-level decontamination scan: every maximal span of a
    CORPUS document covered by some ≥ k-token substring that also occurs
    in the BENCHMARK corpus — the n-gram-overlap eval-decontamination
    pass (GPT-3's 13-gram discipline; Lee et al.'s exact-substring
    machinery pointed across corpora instead of within one). Returns
    ``(id, span_start, span_end, span_tokens)`` like ``repeated_spans``;
    feeding the spans to an excision or a drop-the-document rule is the
    caller's policy.

    Shape: the benchmark reduces to its DISTINCT shingle set (small —
    eval sets are tiny next to a training corpus) and is BROADCAST, so
    the corpus-side semi-join is map-side: the corpus is scanned ONCE and
    never shuffles before the per-doc islands window. ``exact=True``
    matches on the shingle STRING (hash included as a cheap prefix key),
    so a 64-bit collision cannot flag a clean span; ``exact=False``
    matches hashes only — the fallback when the benchmark's distinct
    shingle strings outgrow the broadcast budget. Nothing is ever
    pairwise. Phrase-level decontam (q118-q122) matches curated phrases;
    this matches ANY shared ≥ k-token substring."""
    bench_text_col = bench_text_col or text_col
    sh_c = shingle_positions(corpus, text_col, id_col, k)
    sh_b = shingle_positions(bench, bench_text_col, id_col, k)
    if exact:
        bench_sh = F.broadcast(sh_b.select("__h", "__sh").distinct())
        marked = sh_c.join(bench_sh, ["__h", "__sh"], "left_semi").select(
            id_col, "pos"
        )
    else:
        bench_h = F.broadcast(sh_b.select("__h").distinct())
        marked = sh_c.join(bench_h, "__h", "left_semi").select(id_col, "pos")
    return _coalesce_marked(marked, id_col, k)


def _coalesce_marked(marked: DataFrame, id_col: str, k: int) -> DataFrame:
    """Gaps-and-islands over marked k-window start positions: consecutive
    positions whose windows touch (gap ≤ k) merge into one maximal span
    ``(id, span_start, span_end inclusive, span_tokens)``. The final
    grouping keys (id, island) are co-located by the window's hash(id)
    partitioning — Catalyst reuses it, no extra shuffle (plan-pinned)."""
    from pyspark.sql import Window

    wd = Window.partitionBy(id_col).orderBy("pos")
    isl = (
        marked.withColumn("__lag", F.lag("pos").over(wd))
        .withColumn(
            "__new",
            F.when(F.col("pos") - F.col("__lag") > k, F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .withColumn("__isl", F.sum("__new").over(wd))
    )
    return isl.groupBy(id_col, "__isl").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
        (F.max("pos") - F.min("pos") + F.lit(k)).cast("long").alias(
            "span_tokens"
        ),
    ).drop("__isl")


def excise_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    exact: bool = True,
) -> DataFrame:
    """The actionable half of ``repeated_spans``: rewrite the corpus with
    repeated substrings EXCISED, keeping the FIRST occurrence (Lee et
    al.'s ExactSubstr dedup applied with keep-one survivorship). Per
    repeated k-shingle, the occurrence with the smallest ``(id, pos)`` is
    canonical; every token covered only by canonical occurrences
    survives, tokens covered by any NON-canonical occurrence are removed,
    and each document reassembles from its surviving tokens. Returns
    ``(id, n_tokens long, n_removed long, clean_text string)`` for EVERY
    input document (zero-removal docs pass through verbatim modulo
    whitespace normalization).

    Same distributed shape as ``repeated_spans`` (shingle hash counts →
    string-confirmed candidates → islands) plus: a ``row_number`` over
    each shingle cluster picks the canonical occurrence (same
    candidate-only window that computes the count — one shuffle serves
    both), and one final equi-join routes span arrays back to documents,
    where a JVM-side higher-order ``filter``/``transform`` drops covered
    positions — no UDFs, span arrays are per-doc tiny (bounded by
    islands, not occurrences). ``exact=False`` keys clusters by the
    64-bit hash instead of the string (collision odds documented on
    ``repeated_spans``)."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.split(normalize_text(text_col), " ").alias("__toks")
    )
    sh = shingle_positions(df, text_col, id_col, k)
    rep_h = (
        sh.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("__h")
    )
    cand = sh.join(rep_h, "__h")
    cluster = "__sh" if exact else "__h"
    wc = Window.partitionBy(cluster)
    wr = Window.partitionBy(cluster).orderBy(id_col, "pos")
    noncanon = (
        cand.withColumn("__cs", F.count(F.lit(1)).over(wc))
        .withColumn("__rn", F.row_number().over(wr))
        .filter((F.col("__cs") >= 2) & (F.col("__rn") > 1))
        .select(id_col, "pos")
    )
    spans = _coalesce_marked(noncanon, id_col, k).groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("__spans")
    )
    out = toks.join(spans, id_col, "left").withColumn(
        "__kept",
        F.expr(
            "filter(transform(__toks, (t, i) -> named_struct('t', t, 'i', i)),"
            " x -> __spans IS NULL OR"
            " NOT exists(__spans, sp -> x.i >= sp.s AND x.i <= sp.e))"
        ),
    )
    return out.select(
        F.col(id_col),
        F.size("__toks").cast("long").alias("n_tokens"),
        (F.size("__toks") - F.size("__kept")).cast("long").alias("n_removed"),
        F.concat_ws(
            " ", F.expr("transform(__kept, x -> x.t)")
        ).alias("clean_text"),
    )


def dup_size_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Duplication-structure report: histogram of exact-duplicate cluster
    sizes over the normalized text (the ``exact_dedup`` equivalence
    relation). Answers "how much of the corpus is duplicated, and in what
    shapes" — the before/after diagnostic every dedup pass should print.
    Two map-side-combinable aggregations (text → cluster size → size
    histogram); nothing is ever pairwise. Returns per cluster size:
    ``(cluster_size long, n_clusters long, n_docs long,
    doc_share double R6)`` where doc_share = the fraction of all
    documents living in clusters of that size.
    """
    sizes = (
        df.select(normalize_text(text_col).alias("__norm"))
        .groupBy("__norm")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )
    hist = sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
    )
    total = hist.agg(F.sum("n_docs").alias("__total"))
    return (
        hist.crossJoin(F.broadcast(total))
        .select(
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(F.col("n_docs") / F.col("__total"), 6).alias("doc_share"),
        )
    )


def kmv_source_overlap(
    df: DataFrame,
    group_col: str,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    sketch_k: int = 256,
) -> DataFrame:
    """Pairwise shingle-set overlap between corpus slices via K-minimum-
    values sketches — "how much does source A's content overlap source
    B's?" without ever joining the two slices' full shingle sets.

    KMV estimator: per slice, keep the ``sketch_k`` SMALLEST distinct
    shingle hashes. For a pair (A, B), take the ``sketch_k`` smallest of
    the union of the two sketches; the fraction of those present in BOTH
    is an unbiased estimate of Jaccard(A, B). Fully deterministic (the
    engine-portable md5 hash), so the DuckDB oracle reproduces the
    estimate bit-for-bit — and a property test compares it against the
    exact Jaccard it stands in for.

    Scale shape: one shingle scan reduces each slice to a ``sketch_k``-row
    sketch (per-group window over distinct (group, hash) — map-side
    combinable distinct, bounded output). Everything pairwise happens on
    sketch-sized frames: (n_groups² × sketch_k) rows at most, driver-free.
    The exact alternative — a distinct-shingle equi-join per pair — is the
    O(corpus) cost this operator exists to avoid at 100 TB.

    Returns one row per unordered pair:
    ``(src_a, src_b, sketch_a, sketch_b, kmv_k, matches, jaccard_est R6)``.
    """
    from pyspark.sql import Window

    staged = with_shingle_array(fan_out(df), text_col, "__kmv_arr", k)
    gh = (
        staged.select(
            F.col(group_col).alias("g"),
            F.explode(F.array_distinct("__kmv_arr")).alias("s"),
        )
        .select("g", hashing.md5_long(F.col("s")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("g").orderBy("h")
    sk = _materialize(
        gh.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= sketch_k)
        .drop("__rn")
    )
    srcs = sk.select("g").distinct()
    pairs = (
        srcs.select(F.col("g").alias("src_a"))
        .crossJoin(F.broadcast(srcs.select(F.col("g").alias("src_b"))))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    ra = sk.join(pairs, sk["g"] == pairs["src_a"]).select("src_a", "src_b", "h")
    rb = sk.join(pairs, sk["g"] == pairs["src_b"]).select("src_a", "src_b", "h")
    per = ra.unionByName(rb).groupBy("src_a", "src_b", "h").agg(
        F.count(F.lit(1)).alias("sides")
    )
    w2 = Window.partitionBy("src_a", "src_b").orderBy("h")
    est = (
        per.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= sketch_k)
        .groupBy("src_a", "src_b")
        .agg(
            F.max("rn").alias("kmv_k"),
            F.sum(F.when(F.col("sides") == 2, 1).otherwise(0)).alias("matches"),
        )
    )
    szs = sk.groupBy("g").agg(F.count(F.lit(1)).alias("sz"))
    return (
        est.join(F.broadcast(szs.select(F.col("g").alias("src_a"), F.col("sz").alias("sketch_a"))), "src_a")
        .join(F.broadcast(szs.select(F.col("g").alias("src_b"), F.col("sz").alias("sketch_b"))), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("sketch_a").cast("long").alias("sketch_a"),
            F.col("sketch_b").cast("long").alias("sketch_b"),
            F.col("kmv_k").cast("long").alias("kmv_k"),
            F.col("matches").cast("long").alias("matches"),
            F.round(F.col("matches") / F.col("kmv_k"), 6).alias("jaccard_est"),
        )
    )


def lsh_recall_curve(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.1,
    max_df: int | None = 100,
) -> DataFrame:
    """Empirical recall curve of the banded MinHash-LSH scheme against
    exact n-gram Jaccard — the engine auditing its OWN approximation.

    Ground truth: ``ngram_jaccard_pairs`` (exact Jaccard ≥ threshold over
    pairs sharing a rare gram). Candidates: ``minhash_lsh_candidates``
    with the same shingle definition. Truth pairs bucket by Jaccard
    decile; per bucket the output reports how many LSH caught — the
    measured S-curve that tells an operator whether (num_hashes, bands)
    matches the dedup threshold BEFORE a 100 TB pass runs with a
    mis-tuned scheme.

    Scale shape: both inputs are the already-scalable operators (banded
    buckets / rare-gram inverted index — never all-pairs); the audit
    itself is one equi-join of two pair frames + a decile aggregate.
    Returns ``(bucket_lo R1, n_pairs, n_caught, recall R6)``.
    """
    truth = ngram_jaccard_pairs(df, id_col, text_col, k, threshold, max_df)
    sig = minhash_signatures_inline(df, id_col, text_col, k=k, num_hashes=num_hashes)
    cand = minhash_lsh_candidates(sig, id_col, num_hashes=num_hashes, bands=bands)
    joined = truth.join(
        cand.withColumn("__caught", F.lit(1)), ["id_a", "id_b"], "left"
    )
    bucket = F.least(F.floor(F.col("jaccard") * 10), F.lit(9)) / 10.0
    return (
        joined.groupBy(bucket.alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.coalesce("__caught", F.lit(0))).alias("n_caught"),
        )
        .select(
            F.round("bucket_lo", 1).alias("bucket_lo"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("n_caught").cast("long").alias("n_caught"),
            F.round(F.col("n_caught") / F.col("n_pairs"), 6).alias("recall"),
        )
    )


def dup_flow_matrix(
    df: DataFrame,
    id_col: str,
    group_col: str,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 100,
) -> DataFrame:
    """Duplication-flow matrix: near-duplicate PAIR counts between corpus
    slices — "which sources copy which?" The provenance report a dedup
    pass emits so mirror-heavy source pairs get a crawl-level fix instead
    of per-document ones. KMV overlap (kmv_source_overlap) measures
    shared CONTENT VOLUME; this counts verified near-dup DOCUMENT PAIRS
    (Jaccard ≥ threshold via the rare-gram inverted index — never
    all-pairs), bucketed by unordered slice pair, with the within-slice
    diagonal included. Returns ``(src_a, src_b, n_pairs)``.
    """
    pairs = ngram_jaccard_pairs(df, id_col, text_col, k, threshold, max_df)
    src = df.select(F.col(id_col), F.col(group_col))
    return (
        pairs.join(
            src.select(
                F.col(id_col).alias("id_a"), F.col(group_col).alias("__sa")
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col(id_col).alias("id_b"), F.col(group_col).alias("__sb")
            ),
            "id_b",
        )
        .select(
            F.least("__sa", "__sb").alias("src_a"),
            F.greatest("__sa", "__sb").alias("src_b"),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def soft_dedup_weights(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Soft deduplication: instead of dropping duplicates, weight every
    document by 1/|its exact-duplicate cluster| (normalized text), so a
    passage repeated 40× contributes once in expectation — the
    production alternative when hard dedup is too aggressive (keeps
    coverage, kills over-representation). One hash-groupBy for cluster
    sizes + one equi-join back; nothing pairwise. Returns
    ``(id, cluster_size, weight R6)``.
    """
    keyed = fan_out(df).select(
        F.col(id_col), normalize_text(text_col).alias("__norm")
    )
    sizes = keyed.groupBy("__norm").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        keyed.join(sizes, "__norm")
        .select(
            F.col(id_col),
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.round(F.lit(1.0) / F.col("cluster_size"), 6).alias("weight"),
        )
    )


def effective_sample_size(
    df: DataFrame,
    group_col: str,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Per-group effective sample size under soft-dedup weights:

        ESS = (Σ w)² / Σ w²,   w = 1/|exact-dup cluster|  (global clusters)

    — "after discounting duplication, how many INDEPENDENT documents
    does each source really contribute?" The number a mixing pass should
    budget on instead of raw row counts. ``dup_discount`` = Σw/n (1.0 =
    no duplication). Cluster sizes are global (a passage shared across
    sources discounts in every source it appears in). Returns
    ``(group, n_docs, sum_w R6, ess R6, dup_discount R6)``.
    """
    keyed = fan_out(df).select(
        F.col(group_col).alias("__g"), normalize_text(text_col).alias("__norm")
    )
    sizes = keyed.groupBy("__norm").agg(
        F.count(F.lit(1)).alias("__cs")
    )
    w = keyed.join(sizes, "__norm").select(
        "__g", (F.lit(1.0) / F.col("__cs")).alias("__w")
    )
    return (
        w.groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__w").alias("__sw"),
            F.sum(F.col("__w") * F.col("__w")).alias("__sw2"),
        )
        .select(
            F.col("__g").alias(group_col),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round("__sw", 6).alias("sum_w"),
            F.round(F.col("__sw") * F.col("__sw") / F.col("__sw2"), 6).alias("ess"),
            F.round(F.col("__sw") / F.col("n_docs"), 6).alias("dup_discount"),
        )
    )
