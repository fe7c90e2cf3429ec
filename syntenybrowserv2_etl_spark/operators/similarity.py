"""Similarity search over embedding columns (array<float>).

Two paths:
  knn_bruteforce — exact cosine top-k. The dot product is a native
    ``zip_with``+``aggregate`` expression (JVM-side, no Python). The query
    side is tiny → broadcast; the corpus never shuffles; top-k is a window
    ranking per query (or a single ORDER BY ... LIMIT for one query).
    At 100 TB this is one scan + map + per-partition partial top-k — the
    right baseline and often the right answer.

  knn_ivf — IVF-style: corpus vectors are assigned to the nearest of C
    centroids (a broadcast list); queries probe the ``nprobe`` nearest
    centroids and scan only those partitions. Partition pruning comes free
    when the corpus is written partitioned by centroid id. Centroids here
    are chosen deterministically (hash-seeded sample) rather than by
    k-means — the plumbing (assignment, probing, pruning) is the part that
    matters at scale and is fully tested; swap in trained centroids at will.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + (x * x).cast("double")))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries``: (query_id, vec) — broadcast (queries ≪ corpus always).
    Output: (query_id, vec_id, cosine, rank), rank 1..k, ties broken by
    corpus id for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            # query norm staged once per QUERY (rides the broadcast),
            # not once per (corpus row, query) pair
            norm_expr(F.col(vec_col)).alias("__qnrm"),
        )
    )
    scored = (
        # corpus norm staged once per corpus ROW; the Join node between
        # this Project and the cosine projection blocks CollapseProject
        # from re-inlining it per pair (the HOF staging discipline)
        corpus.withColumn("__vnrm", norm_expr(F.col(vec_col)))
        .crossJoin(q)
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            # same float ops as cosine_expr: dot / (sqrt(a)·sqrt(b)) —
            # bit-identical to the inline form, so the _cos_sql oracles
            # still hash-match
            (
                dot_expr(F.col(vec_col), F.col("__qvec"))
                / (F.col("__vnrm") * F.col("__qnrm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _local_table(df: DataFrame) -> DataFrame:
    """Materialize a METADATA-SCALE frame (centroid / codebook tables) as
    a driver-local relation. Bit-exact: float32 values round-trip JVM →
    Python double → float32 unchanged (widening then exact narrowing;
    pinned by test_local_table_bit_exact_float_roundtrip).

    Round-17 measurement note: this was trialled as the per-round
    materialization of the kmeans/PQ trainers and REJECTED — in
    full-query context the createDataFrame(parallelize) roundtrip costs
    more than the localCheckpoint job it replaces (alternating A/B, both
    orders: q88 old 2.9-5.4 s vs new 4.4-6.3 s). localCheckpoint remains
    the trainers' materialization; this helper stays for callers that
    need a genuinely local relation (e.g. plan-size control).

    Guarded to metadata scale (ADVICE r17): collect() of a corpus-scale
    frame would be a driver OOM, so a caller passing one is a bug."""
    max_rows = 100_000
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"_local_table is for metadata-scale frames (> {max_rows} rows "
            "collected); materialize with localCheckpoint instead"
        )
    return df.sparkSession.createDataFrame(rows, df.schema)


def centroid_array(
    centroids: DataFrame,
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
) -> DataFrame:
    """The ONE-ROW ``array<struct<id, vec, nrm>>`` form of a centroid
    table — the broadcast unit every narrow IVF consumer shares.

    ``assign_centroids`` (argmax assignment) and ``knn_ivf``'s
    ``narrow_probe`` ranking both fold over exactly this struct array.
    Built independently by each consumer, the plan carries the
    collect_list aggregation (ObjectHashAggregate + its Exchange) and a
    separate BroadcastExchange TWICE per pipeline (round-17 q167/q116
    after-plans). Building it once — and, in multi-consumer pipelines,
    ``localCheckpoint(eager=True)``-ing the one-row result — leaves one
    aggregation job; the consumers' broadcast subtrees become identical
    ``Scan ExistingRDD`` leaves Spark can reuse (round 18, guide §2.4).
    Element order is whatever collect_list produced; every consumer is
    order-insensitive (array_max / array_sort with explicit tie-breaks).
    """
    return centroids.agg(
        F.collect_list(
            F.struct(
                F.col(centroid_id_col).alias("id"),
                F.col(centroid_vec_col).alias("vec"),
                norm_expr(F.col(centroid_vec_col)).alias("nrm"),
            )
        ).alias("__cents")
    )


def assign_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
    cent_arr: DataFrame | None = None,
) -> DataFrame:
    """IVF assignment: tag every corpus vector with its nearest centroid.

    Fully narrow — ZERO corpus shuffle: the centroid table collapses to a
    single array<struct> row, broadcast to every task; per corpus row the
    argmax is ``array_max`` over per-centroid (sim, -id) structs (struct
    ordering gives highest-sim, ties to the smallest centroid id,
    deterministically). The earlier formulation (cross-join + re-group on
    all corpus columns) shuffled the full corpus incl. vectors once;
    assignment is a pure map and should plan like one. Writing the result
    partitioned by centroid_id then gives physical partition pruning for
    probes.
    """
    # norms are staged OUT of the argmax lambda: HOF lambdas re-evaluate
    # per element with no CSE (the engine-wide staging discipline), so the
    # inlined cosine_expr would recompute the ROW's norm once per centroid
    # and each centroid's norm once per row. The centroid norm rides the
    # broadcast struct; the row norm is a staged column consumed twice in
    # the final projection (which is what keeps CollapseProject from
    # re-inlining it into the lambda). Same float bits as cosine_expr —
    # the identical sqrt, computed once.
    # ``cent_arr``: a prebuilt (possibly checkpointed) centroid_array()
    # frame — multi-consumer pipelines pass it so the collect_list
    # aggregation runs once, not once per consumer (round 18).
    cent_arr = F.broadcast(
        centroid_array(centroids, centroid_id_col, centroid_vec_col)
        if cent_arr is None
        else cent_arr
    )
    best = F.array_max(
        F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                (
                    dot_expr(F.col(vec_col), c["vec"])
                    / (F.col("__vnrm") * c["nrm"])
                ).alias("sim"),
                (-c["id"]).alias("negid"),
            ),
        )
    )
    return (
        corpus.withColumn("__vnrm", norm_expr(F.col(vec_col)))
        .crossJoin(cent_arr)
        .withColumn(
            centroid_id_col,
            # second __vnrm reference (NaN guard on the zero vector — the
            # same NaN cosine_expr would produce) doubles as the
            # anti-re-inline consumption
            F.when(F.col("__vnrm").isNotNull(), -best["negid"]),
        )
        .drop("__cents", "__vnrm")
    )


def pick_centroids(
    corpus: DataFrame,
    num: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic centroid choice: the ``num`` corpus vectors with the
    smallest md5-hash of their id (a seeded uniform sample without RNG
    state, reproducible across engines/runs)."""
    from ..functions import hashing

    return (
        corpus.select(
            F.col(id_col),
            F.col(vec_col).alias("centroid"),
            hashing.md5_long(F.col(id_col)).alias("__h"),
        )
        .orderBy("__h", id_col)
        .limit(num)
        .select(
            F.row_number().over(Window.orderBy("__h", id_col)).alias("centroid_id"),
            "centroid",
        )
    )


def knn_ivf(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    nprobe: int = 2,
    broadcast_probe: bool = True,
    probe_salt: int = 1,
    narrow_probe: bool = False,
    cent_arr: DataFrame | None = None,
) -> DataFrame:
    """IVF probe: per query, rank centroids, scan only the top ``nprobe``
    cells, exact-rank within them. Same output shape as knn_bruteforce.

    Works for ONE query or a whole query TABLE (the batched kNN-join shape
    a retrieval/dedup pipeline needs: top-k corpus neighbors for every row
    of a query set). ``broadcast_probe`` picks the distribution strategy
    for the probe→cell join:

    - ``True`` (default): the (query, probed-cell) list is broadcast and
      the corpus never shuffles — right when queries ≪ executors' memory
      (interactive lookups, small eval sets).
    - ``False``: shuffle join on ``centroid_id`` — both sides hash to the
      same cells, so each task scores one cell's corpus rows against
      exactly the queries probing that cell. Right when the query set is
      itself table-scale (millions of rows × nprobe replicas would melt a
      broadcast).

    ``narrow_probe`` (round 14): the default probe ranks centroids with a
    row_number window — an exchange of (queries × C) rows carrying a
    REPLICATED copy of every query vector, fine for interactive query
    sets, real shuffle traffic when the query side is a corpus fraction
    (q167's audit sample). With ``narrow_probe=True`` the top-``nprobe``
    cells come from a broadcast centroid ARRAY per query row —
    ``array_sort`` on (−sim, id) structs then ``slice`` — so probe
    selection is a pure map: zero exchanges, no vector replication, and
    the identical cells/tie-breaks as the window form (pinned by test).
    Degenerate zero-norm queries (NaN cosine) may order differently
    between the two forms; both are meaningless for them.

    ``probe_salt`` (shuffle path only): a bare cell-keyed join has at
    most |cells| distinct keys, so cluster parallelism COLLAPSES to the
    centroid count no matter how many executors exist — the SCALE.md
    knn_batch curve measured an 18× slowdown vs broadcast at 16× data
    from exactly this. Salting splits each cell into ``probe_salt``
    sub-keys (corpus rows by id-hash pmod, probes replicated to every
    salt — the containment-join chunking discipline): identical scored
    pairs BY CONSTRUCTION (each (corpus row, probe) meets on exactly one
    (cell, salt) sub-key), join parallelism |cells| × salt, probe-side
    rows × salt as the price. Size it so |cells| × salt ≳ cluster cores;
    1 disables.

    ``cent_arr`` (round 18, narrow_probe only): a prebuilt
    :func:`centroid_array` frame; pipelines whose assignment uses the same
    centroids pass the one (checkpointed) array so the collect_list build
    runs once per pipeline instead of once per consumer.
    """
    q = queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
    if narrow_probe:
        # prebuilt cent_arr (see centroid_array): pipelines that also
        # assign with the same centroids share ONE collect_list build
        cent_arr = F.broadcast(
            centroid_array(centroids) if cent_arr is None else cent_arr
        )
        # (−sim, id) struct ordering ≡ the window's (sim DESC, id ASC)
        top_cells = F.slice(
            F.array_sort(
                F.transform(
                    F.col("__cents"),
                    lambda c: F.struct(
                        (
                            -(
                                dot_expr(F.col("__qvec"), c["vec"])
                                / (F.col("__qnrm") * c["nrm"])
                            )
                        ).alias("negsim"),
                        c["id"].alias("id"),
                    ),
                )
            ),
            1,
            nprobe,
        )
        probe = (
            q.withColumn("__qnrm", norm_expr(F.col("__qvec")))
            .crossJoin(cent_arr)
            .select(
                query_id_col,
                "__qvec",
                "__qnrm",
                F.explode(top_cells).alias("__tc"),
            )
            .select(
                query_id_col,
                "__qvec",
                F.col("__tc")["id"].alias("centroid_id"),
                "__qnrm",
            )
        )
    else:
        cw = Window.partitionBy(query_id_col).orderBy(
            F.col("__csim").desc(), F.col("centroid_id").asc()
        )
        probe = (
            q.crossJoin(F.broadcast(centroids))
            .select(
                query_id_col,
                "__qvec",
                "centroid_id",
                cosine_expr(F.col("__qvec"), F.col("centroid")).alias("__csim"),
            )
            .withColumn("__cr", F.row_number().over(cw))
            .filter(F.col("__cr") <= nprobe)
            # query norm staged once per (query, probed cell) — materialized
            # through the broadcast/shuffle, never recomputed per scored pair
            .select(
                query_id_col,
                "__qvec",
                "centroid_id",
                norm_expr(F.col("__qvec")).alias("__qnrm"),
            )
        )
    # corpus norm staged once per corpus row (the exchange/Join boundary
    # keeps CollapseProject from re-inlining it into the per-pair cosine)
    corpus = assigned.withColumn("__vnrm", norm_expr(F.col(vec_col)))
    if broadcast_probe:
        probe = F.broadcast(probe)
        join_keys = ["centroid_id"]
    else:
        if probe_salt > 1:
            corpus = corpus.withColumn(
                "__salt", F.pmod(F.hash(F.col(id_col)), F.lit(probe_salt))
            )
            probe = probe.withColumn(
                "__salt",
                F.explode(F.sequence(F.lit(0), F.lit(probe_salt - 1))),
            )
            join_keys = ["centroid_id", "__salt"]
        else:
            join_keys = ["centroid_id"]
        # build the hash map on the probe side and STREAM the corpus:
        # with |cells| distinct keys a SortMergeJoin degenerates into
        # giant per-key group scans (measured 110 s vs 19 s at the 16×
        # SCALE point); the hash build is |queries probing the
        # partition's cells| — the side that must fit memory anyway
        probe = probe.hint("shuffle_hash")
    scored = (
        corpus.join(probe, join_keys)
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            # same float ops as cosine_expr (dot / (sqrt·sqrt)) — the
            # _cos_sql oracles still hash-match
            (
                dot_expr(F.col(vec_col), F.col("__qvec"))
                / (F.col("__vnrm") * F.col("__qnrm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_out: str = "scale",
    codes_out: str = "codes",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — a row-local projection.

    The 100 TB storage lever: fp32 embeddings → 1 byte/dim + one fp32
    scale (≈4× smaller, and int8 dot products are SIMD-friendly on the
    serving side). scale = max|v| / 127; code_i = round(v_i / scale),
    so codes span [-127, 127] and reconstruction error per dim is ≤
    scale/2. All math in double so the SQL oracle reproduces codes
    value-for-value. Zero vectors quantize to all-zero codes (scale clamps
    away from 0 instead of dividing by it).

    ``scale`` is staged as its own column, NOT inlined into the transform
    lambda: a loop-invariant aggregate inside a higher-order-function body
    is re-evaluated per element (O(d²) per vector). CollapseProject leaves
    the two projections separate because the non-cheap alias is consumed
    twice (output + lambda), so the max|v| pass runs once per row.
    """
    c = F.col(vec_col)
    max_abs = F.aggregate(
        c, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    staged = df.withColumn(scale_out, F.greatest(max_abs, F.lit(1e-30)) / F.lit(127.0))
    return staged.withColumn(
        codes_out,
        F.transform(c, lambda x: F.round(x.cast("double") / F.col(scale_out)).cast("int")),
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Spherical k-means training for the IVF index — DataFrame-only Lloyd.

    Assignment is the shuffle-free broadcast argmax (assign_centroids).
    The update step is posexplode → groupBy(centroid, dimension) → avg →
    re-assemble: the plan carries ONE aggregate expression regardless of
    vector width (the r1 version built ``dim`` separate avg columns —
    thousands of expressions per round at production widths 768-4096,
    Catalyst plan bloat). Scale shape: partial aggregation compresses each
    map task's exploded rows to ≤ k·dim partial sums before the shuffle,
    so the exchange moves O(tasks · k · dim) — never the corpus — and the
    (centroid, dim) key space is k·dim-wide, immune to hot-cluster skew
    (a per-centroid pandas group would put a whole cluster on one task).
    The k·dim → k re-assembly groupBy is negligible.

    Updated means are L2-normalized: with cosine assignment the
    normalized-mean update is the monotone (spherical) variant — plain
    Lloyd means are not monotone under cosine. Empty clusters drop out
    (standard behavior); per-round localCheckpoint keeps lineage flat
    (round 17: a driver-local-relation variant measured SLOWER in
    full-query context — createDataFrame roundtrip per round — and was
    reverted; see _local_table).

    Deterministic given the corpus: init is the hash-minimal sample
    (pick_centroids), no RNG anywhere.
    """
    cents = pick_centroids(corpus, k, id_col, vec_col).localCheckpoint(eager=True)
    for _ in range(iters):
        assigned = assign_centroids(corpus, cents, id_col, vec_col)
        dims = (
            assigned.select(
                "centroid_id", F.posexplode(F.col(vec_col)).alias("__pos", "__val")
            )
            .groupBy("centroid_id", "__pos")
            .agg(F.avg(F.col("__val").cast("double")).alias("__avg"))
        )
        means = (
            dims.groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__avg"))
                ).alias("__pairs")
            )
            .select(
                "centroid_id",
                F.transform(F.col("__pairs"), lambda p: p["__avg"]).alias("__mean"),
            )
        )
        normed = means.withColumn("__nrm", norm_expr(F.col("__mean"))).select(
            "centroid_id",
            F.transform(
                "__mean", lambda x: (x / F.col("__nrm")).cast("float")
            ).alias("centroid"),
        )
        cents = normed.localCheckpoint(eager=True)
    return cents


def cluster_profile(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster size + mean cosine-to-centroid (the spherical objective)."""
    assigned = assign_centroids(corpus, centroids, id_col, vec_col)
    cent_lookup = F.broadcast(
        centroids.select(
            F.col("centroid_id"), F.col("centroid").alias("__cvec")
        )
    )
    return (
        assigned.join(cent_lookup, "centroid_id")
        .withColumn("__cos", cosine_expr(F.col(vec_col), F.col("__cvec")))
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("__cos"), 4).alias("mean_cosine"),
        )
    )


# --- Product quantization (PQ) ---------------------------------------------


def _subvectors(
    df: DataFrame, vec_col: str, m_subspaces: int, sub_len: int
) -> DataFrame:
    """Long-form (…, s, sub) rows: one per (row, subspace). Row-local."""
    return df.select(
        *[c for c in df.columns if c != vec_col],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice(F.col(vec_col), s * sub_len + 1, sub_len).alias(
                            "__sub"
                        ),
                    )
                    for s in range(m_subspaces)
                ]
            )
        ).alias("__sv"),
    ).select("*", F.col("__sv.s").alias("s"), F.col("__sv.__sub").alias("__sub")).drop(
        "__sv"
    )


def _l2sq_expr(a: Column, b: Column) -> Column:
    """Σ (a_i - b_i)² — differences multiply in FLOAT, each square is cast
    to DOUBLE, the sum left-folds in array order (the _cos_sql bit-parity
    discipline, applied to L2)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )


def _pq_assign(sv: DataFrame, codebooks: DataFrame) -> DataFrame:
    """Nearest codeword per (row, subspace): broadcast per-subspace codeword
    arrays, row-local argmin via struct-max over (-dist, -id) — zero
    shuffle of the vectors, the assign_centroids pattern under L2."""
    cb = F.broadcast(
        codebooks.groupBy("s").agg(
            F.collect_list(
                F.struct(F.col("centroid_id").alias("id"), F.col("centroid").alias("vec"))
            ).alias("__cands")
        )
    )
    best = F.array_max(
        F.transform(
            F.col("__cands"),
            lambda c: F.struct(
                (-_l2sq_expr(F.col("__sub"), c["vec"])).alias("negd"),
                (-c["id"]).alias("negid"),
            ),
        )
    )
    return sv.join(cb, "s").withColumn("code", -best["negid"]).drop("__cands")


def pq_codebooks(
    corpus: DataFrame,
    m_subspaces: int = 4,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Product-quantization codebook training (Jégou et al. 2011): split
    each vector into ``m_subspaces`` contiguous subvectors and run plain
    Lloyd k-means INDEPENDENTLY per subspace — all subspaces train in the
    SAME jobs (subspace is a column, not a loop), so the per-round cost is
    one assign pass + one (s, centroid, dim)-keyed partial aggregation
    regardless of M.

    Deterministic: hash-minimal init (the same k corpus rows seed every
    subspace), argmin ties to the smaller codeword id, no RNG. Updates are
    per-dimension means cast to float (no normalization — L2 Lloyd);
    empty codewords drop out. Per-round localCheckpoint keeps lineage
    flat (round 17: the driver-local-relation variant measured slower —
    see _local_table). Output: (s, centroid_id, centroid).
    """
    if dim is None:
        dim = corpus.select(F.min(F.size(vec_col)).alias("d")).first()["d"]
    sub_len = dim // m_subspaces
    sv = _subvectors(
        corpus.select(id_col, vec_col), vec_col, m_subspaces, sub_len
    ).localCheckpoint(eager=True)
    seeds = (
        corpus.select(
            F.col(id_col),
            hashing.md5_long(F.col(id_col).cast("string")).alias("__h"),
        )
        .orderBy("__h", id_col)
        .limit(k)
        .select(
            F.col(id_col),
            F.row_number().over(Window.orderBy("__h", id_col)).alias("centroid_id"),
        )
    )
    cents = (
        sv.join(seeds, id_col)
        .select("s", "centroid_id", F.col("__sub").alias("centroid"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        assigned = _pq_assign(sv, cents)
        dims_agg = (
            assigned.select(
                "s", "code", F.posexplode(F.col("__sub")).alias("__pos", "__val")
            )
            .groupBy("s", "code", "__pos")
            .agg(F.avg(F.col("__val").cast("double")).alias("__avg"))
        )
        cents = (
            dims_agg.groupBy("s", "code")
            .agg(
                F.array_sort(F.collect_list(F.struct("__pos", "__avg"))).alias(
                    "__pairs"
                )
            )
            .select(
                "s",
                F.col("code").alias("centroid_id"),
                F.transform(
                    F.col("__pairs"), lambda p: p["__avg"].cast("float")
                ).alias("centroid"),
            )
        )
        cents = cents.localCheckpoint(eager=True)
    return cents


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m_subspaces: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Encode each vector as its nearest codeword per subspace —
    (id, s, code) long form, the layout that joins against an ADC lookup
    table without any pivot. Row-local given the broadcast codebooks:
    at 100 TB this is a map-only pass that shrinks 4-byte floats to
    log2(k)-bit codes (the entire point of PQ)."""
    if dim is None:
        dim = corpus.select(F.min(F.size(vec_col)).alias("d")).first()["d"]
    sub_len = dim // m_subspaces
    sv = _subvectors(corpus.select(id_col, vec_col), vec_col, m_subspaces, sub_len)
    return _pq_assign(sv, codebooks).select(id_col, "s", "code")


def pq_adc_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    m_subspaces: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    dim: int | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: score(x) ≈ Σ_m dot(q_m, c_m[code_m]).

    The per-query lookup table (M·k dot products) broadcasts; the corpus
    side touches only its integer codes — the scan that makes PQ search
    cheap at scale. Scores round to 6 decimals (the M-way sum is the only
    order-dependent float op) and rank ties break on id; the final top-k
    plans as WindowGroupLimit. Output: (query_id, id, score, rank).
    """
    if dim is None:
        dim = queries.select(F.min(F.size(query_vec_col)).alias("d")).first()["d"]
    sub_len = dim // m_subspaces
    qsv = _subvectors(
        queries.select(query_id_col, query_vec_col),
        query_vec_col,
        m_subspaces,
        sub_len,
    )
    lut = F.broadcast(
        qsv.join(codebooks, "s").select(
            query_id_col,
            "s",
            F.col("centroid_id").alias("code"),
            dot_expr(F.col("__sub"), F.col("centroid")).alias("__partial"),
        )
    )
    scored = (
        codes.join(lut, ["s", "code"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("__partial"), 6).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_pq_topk(
    assigned: DataFrame,
    codes: DataFrame,
    cells: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    m_subspaces: int = 4,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    dim: int | None = None,
) -> DataFrame:
    """IVF-PQ search — the billion-scale ANN shape (Jégou et al. 2011;
    what FAISS serves in production): the IVF coarse index routes each
    query to its ``nprobe`` nearest cells, and only those cells'
    vectors are scored — via their PQ codes (ADC), never their floats.

    ``assigned``: (id, centroid_id) from assign_centroids over ``cells``;
    ``codes``: (id, s, code) from pq_encode. At scale both live
    partitioned by centroid_id, so the probe is a partition-pruned read
    of nprobe/n_cells of the corpus; here it is a join on the cell id.
    The cell table and the per-query ADC lookup table both broadcast —
    the only per-query work proportional to the corpus is the pruned
    code scan. Scores round to 6 decimals, ties break on id, top-k plans
    as WindowGroupLimit. Output: (query_id, id, score, rank).
    """
    if dim is None:
        dim = queries.select(F.min(F.size(query_vec_col)).alias("d")).first()["d"]
    sub_len = dim // m_subspaces
    probe = _ivf_probe(queries, cells, nprobe, query_id_col, query_vec_col)
    candidates = assigned.join(probe, "centroid_id").select(query_id_col, id_col)
    lut = _adc_lut(
        queries, codebooks, m_subspaces, sub_len, query_id_col, query_vec_col
    )
    scored_codes = codes.join(candidates, id_col)
    return _adc_rank(scored_codes, lut, k, id_col, query_id_col)


def _ivf_probe(
    queries: DataFrame,
    cells: DataFrame,
    nprobe: int,
    query_id_col: str,
    query_vec_col: str,
) -> DataFrame:
    """Coarse routing: each query's ``nprobe`` nearest cells as broadcast
    (query_id, centroid_id) rows — query-batch-sized, never corpus-sized."""
    return F.broadcast(
        queries.crossJoin(
            F.broadcast(cells.select("centroid_id", F.col("centroid").alias("__cv")))
        )
        .select(
            query_id_col,
            "centroid_id",
            F.row_number()
            .over(
                Window.partitionBy(query_id_col).orderBy(
                    cosine_expr(F.col(query_vec_col), F.col("__cv")).desc(),
                    F.col("centroid_id").asc(),
                )
            )
            .alias("__cr"),
        )
        .filter(F.col("__cr") <= nprobe)
        .select(query_id_col, "centroid_id")
    )


def _adc_lut(
    queries: DataFrame,
    codebooks: DataFrame,
    m_subspaces: int,
    sub_len: int,
    query_id_col: str,
    query_vec_col: str,
) -> DataFrame:
    """Per-query ADC lookup table — |queries|·M·k rows, broadcast."""
    qsv = _subvectors(
        queries.select(query_id_col, query_vec_col),
        query_vec_col,
        m_subspaces,
        sub_len,
    )
    return F.broadcast(
        qsv.join(codebooks, "s").select(
            F.col(query_id_col).alias("__qid"),
            "s",
            F.col("centroid_id").alias("code"),
            dot_expr(F.col("__sub"), F.col("centroid")).alias("__partial"),
        )
    )


def _adc_rank(
    scored_codes: DataFrame,
    lut: DataFrame,
    k: int,
    id_col: str,
    query_id_col: str,
) -> DataFrame:
    """ADC scoring + top-k: codes ⋈ broadcast LUT → per-(query, id) SUM →
    WindowGroupLimit rank. Scores round to 6 decimals, ties break on id."""
    scored = (
        scored_codes.join(
            lut,
            (F.col(query_id_col) == F.col("__qid"))
            & (scored_codes["s"] == lut["s"])
            & (scored_codes["code"] == lut["code"]),
        )
        .filter(F.col(id_col) != F.col(query_id_col))
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("__partial"), 6).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def write_ivf_index(
    assigned: DataFrame,
    codes: DataFrame,
    path: str,
    id_col: str = "vec_id",
) -> None:
    """Persist the IVF-PQ index in its query-serving layout: each vector's
    PQ codes co-located with its coarse cell, parquet-partitioned by
    ``centroid_id`` — one directory per cell holding (id, s, code) rows.

    This materializes the layout ivf_pq_topk's docstring promises: a probe
    of ``nprobe`` cells becomes a PARTITION-PRUNED read touching only
    nprobe directories out of n_cells (pinned by
    tests/test_plans.py::test_ivf_index_probe_prunes_partitions via
    inputFiles), so per-query corpus I/O is nprobe/n_cells of the codes —
    the FAISS serving contract expressed as parquet partition pruning.
    Production sizes n_cells ∝ corpus (√n is the IVF rule of thumb) to
    hold per-cell bytes flat as the corpus grows.

    Layout is two-level: ``centroid_id=<c>/__ib=<batch>`` — the base
    build writes ``__ib=-1``; ivf_index_append_batch grows the index
    under per-batch sub-partitions without rebuilding (cell pruning only
    looks at the first level, so serving is unaffected). The
    repartition keeps it one file per (cell, batch) — without it every
    write task spills a file into every cell dir (the merge-sink
    tasks × partitions lesson).
    """
    (
        codes.join(assigned.select(id_col, "centroid_id"), id_col)
        .withColumn("__ib", F.lit(-1).cast("long"))
        .repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id", "__ib")
        .parquet(path)
    )


def ivf_index_append_batch(
    new_vectors: DataFrame,
    batch_id: int,
    *,
    index_path: str,
    cells: DataFrame,
    codebooks: DataFrame,
    m_subspaces: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> None:
    """Grow the persisted IVF-PQ index incrementally — the ingest path
    that keeps an ANN index serving while the corpus streams in, with no
    full rebuild: new vectors are assigned to the EXISTING coarse cells
    and encoded against the EXISTING codebooks (the standard serving
    trade — recall drifts as the data distribution moves, until a
    periodic retrain rebuilds cells/codebooks), then land as
    ``centroid_id=<c>/__ib=<batch_id>`` sub-partitions.

    Idempotent replay (foreachBatch at-least-once): a ``_batches/<id>``
    marker (written last) skips committed batches outright; an
    uncommitted replay's dynamic partition overwrite rewrites ITS OWN
    (cell, batch) sub-partitions — a deterministic function of the same
    inputs — so a crash at any point never duplicates codes (duplicated
    (id, s, code) rows would double ADC partial sums, silently corrupting
    every score they touch).

    Serving cost is unchanged: probes prune on the first partition level;
    files per cell grow by one per batch (compact periodically, like any
    streamed table).
    """
    spark = new_vectors.sparkSession
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    fs = hpath(index_path).getFileSystem(spark._jsc.hadoopConfiguration())
    from ..sources.io import batch_is_committed

    marker_p = hpath(f"{index_path}/_batches/{batch_id}")
    if batch_is_committed(spark, index_path, batch_id):
        return  # fully-committed batch redelivered (marker or watermark)
    assigned = assign_centroids(
        new_vectors, cells, id_col=id_col, vec_col=vec_col
    )
    codes = pq_encode(
        new_vectors, codebooks, m_subspaces, id_col=id_col,
        vec_col=vec_col, dim=dim,
    )
    (
        codes.join(assigned.select(id_col, "centroid_id"), id_col)
        .withColumn("__ib", F.lit(batch_id).cast("long"))
        .repartition("centroid_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("centroid_id", "__ib")
        .parquet(index_path)
    )
    fs.mkdirs(marker_p)


def probe_ivf_index(spark, path: str, cell_ids: list[int]) -> DataFrame:
    """Partition-pruned read of probe cells: ``centroid_id`` IN (literals)
    resolves at planning time against the partition directories, so only
    the probed cells' files are ever listed or read — base build and
    COMMITTED appended batches (``__ib`` ∈ {-1} ∪ marked ids, ADVICE r10:
    codes from a batch that crashed before its ``_batches`` marker must
    stay invisible until redelivery, or their duplicate rows would double
    ADC partial sums). ``__ib`` is dropped after the filter; it's a
    write-side idempotency coordinate, not data."""
    from ..sources.io import committed_ib_predicate

    return (
        spark.read.parquet(path)
        .filter(F.col("centroid_id").isin([int(c) for c in cell_ids]))
        .filter(committed_ib_predicate(spark, path, base_ib=-1))
        .drop("__ib")
    )


def ivf_pq_topk_indexed(
    spark,
    index_path: str,
    cells: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    m_subspaces: int = 4,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    dim: int | None = None,
) -> DataFrame:
    """IVF-PQ search against the PERSISTED index (write_ivf_index): the
    query batch's probed cells collect to literals (nprobe·|queries| ids,
    driver-metadata-scale) and the code scan is a partition-pruned read of
    exactly those cell directories — identical results to ivf_pq_topk on
    the in-memory frames, but corpus I/O is nprobe/n_cells by layout.
    """
    if dim is None:
        dim = queries.select(F.min(F.size(query_vec_col)).alias("d")).first()["d"]
    sub_len = dim // m_subspaces
    probe = _ivf_probe(
        queries, cells, nprobe, query_id_col, query_vec_col
    ).localCheckpoint(eager=True)
    cell_ids = [r["centroid_id"] for r in probe.select("centroid_id").distinct().collect()]
    pruned = probe_ivf_index(spark, index_path, cell_ids)
    scored_codes = pruned.join(probe, "centroid_id").drop("centroid_id")
    lut = _adc_lut(
        queries, codebooks, m_subspaces, sub_len, query_id_col, query_vec_col
    )
    return _adc_rank(scored_codes, lut, k, id_col, query_id_col)


def ivf_index_append_stream(
    stream_df: DataFrame,
    index_path: str,
    cells: DataFrame,
    codebooks: DataFrame,
    m_subspaces: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    query_name: str = "ivf_index_append",
    checkpoint: str | None = None,
):
    """Streaming index ingest — foreachBatch over ivf_index_append_batch
    (whose marker + own-partition overwrite make at-least-once delivery
    safe). Returns the started StreamingQuery (availableNow trigger;
    caller awaits termination). ``dim`` should be passed explicitly for
    streams (the batch-side inference scans the batch)."""

    def body(batch_df: DataFrame, batch_id: int) -> None:
        ivf_index_append_batch(
            batch_df,
            batch_id,
            index_path=index_path,
            cells=cells,
            codebooks=codebooks,
            m_subspaces=m_subspaces,
            id_col=id_col,
            vec_col=vec_col,
            dim=dim,
        )

    writer = (
        stream_df.writeStream.foreachBatch(body)
        .outputMode("append")
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def ivf_index_compact(spark, index_path: str) -> tuple[int, int]:
    """Fold the IVF index's committed ``__ib`` append batches into the
    ``__ib=-1`` base — one file per cell — the periodic compaction
    ivf_index_append_batch's docstring defers to. Semantics (committed-only
    fold, uncommitted crash batches dropped for deterministic replay,
    markers preserved, staged-rename swap) are the shared
    ``sources/io.fold_ib_partitions`` contract; serving is unaffected
    because probes prune on ``centroid_id`` only."""
    from ..sources.io import fold_ib_partitions

    return fold_ib_partitions(spark, index_path, "centroid_id", base_ib=-1)


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    anchor_id_col: str = "anchor_id",
    k: int = 3,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    top-k most-similar corpus vectors with a DIFFERENT label — the pairs
    that teach a metric model the most (near-duplicates that must be
    pushed apart), and the standard companion of the dedup/kNN family in
    an embedding-training pipeline.

    Same staged-norm broadcast shape as ``knn_bruteforce`` (anchor norms
    ride the broadcast, corpus norms staged once per row, identical float
    ops to cosine_expr so the _cos_sql oracles hash-match); the
    different-label constraint is a filter on the broadcast join, and the
    top-k is a WindowGroupLimit-planned window. This is the exact-oracle
    twin (the q27:q30 split): at corpus scale, feed the anchor set through
    ``knn_ivf``/``knn_batch`` and post-filter labels per probe instead.

    Output: (anchor_id, neg_id, cosine, rank), ties broken by corpus id.
    """
    a = F.broadcast(
        anchors.select(
            F.col(id_col).alias(anchor_id_col),
            F.col(vec_col).alias("__avec"),
            F.col(label_col).alias("__albl"),
            norm_expr(F.col(vec_col)).alias("__anrm"),
        )
    )
    scored = (
        corpus.withColumn("__vnrm", norm_expr(F.col(vec_col)))
        .crossJoin(a)
        .filter(F.col(label_col) != F.col("__albl"))
        .select(
            anchor_id_col,
            F.col(id_col).alias("neg_id"),
            (
                dot_expr(F.col(vec_col), F.col("__avec"))
                / (F.col("__vnrm") * F.col("__anrm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(anchor_id_col).orderBy(
        F.col("cosine").desc(), F.col("neg_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_covariance(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Distributed covariance/correlation matrix of an embedding column —
    the distributed HALF of scalable PCA/whitening: executors reduce the
    corpus to D×D partial Gram sums (Arrow batches → one BLAS ``XᵀX``
    per batch — the sanctioned Python path, never per-row), the shuffle
    carries only D(D+1)/2-sized frames, and the eigensolve that follows
    is a driver/client-local O(D³) on the returned matrix.

    cov(i,j) = E[x_i x_j] − E[x_i]E[x_j] (population), upper triangle
    (i ≤ j); ``corr`` NULL when a dimension has zero variance. Products
    are computed in float64 on float32-exact inputs on both engines, so
    the DuckDB oracle matches to summation-order rounding. Returns
    ``(i, j, n, cov R8, corr R6)``.
    """
    def partial(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = _np.stack(pdf[vec_col].to_numpy()).astype(_np.float64)
            p = x.T @ x
            s = x.sum(axis=0)
            ii, jj = _np.triu_indices(x.shape[1])
            yield _pd.DataFrame(
                {
                    "i": ii.astype("int32"),
                    "j": jj.astype("int32"),
                    "sp": p[ii, jj],
                    "si": s[ii],
                    "sj": s[jj],
                    "n": _np.full(len(ii), len(pdf), dtype="int64"),
                }
            )

    cells = (
        emb.select(vec_col)
        .mapInPandas(
            partial, "i int, j int, sp double, si double, sj double, n long"
        )
        .groupBy("i", "j")
        .agg(
            F.sum("sp").alias("sp"),
            F.sum("si").alias("si"),
            F.sum("sj").alias("sj"),
            F.sum("n").alias("n"),
        )
        .withColumn(
            "cov",
            F.col("sp") / F.col("n")
            - (F.col("si") / F.col("n")) * (F.col("sj") / F.col("n")),
        )
    )
    cells = cells.localCheckpoint(eager=False)
    diag = cells.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("d"), F.col("cov").alias("var")
    )
    return (
        cells.join(
            F.broadcast(diag.select(F.col("d").alias("i"), F.col("var").alias("vi"))),
            "i",
        )
        .join(
            F.broadcast(diag.select(F.col("d").alias("j"), F.col("var").alias("vj"))),
            "j",
        )
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            F.col("n").cast("long").alias("n"),
            F.round("cov", 8).alias("cov"),
            F.round(
                F.when(
                    (F.col("vi") > 0) & (F.col("vj") > 0),
                    F.col("cov") / F.sqrt(F.col("vi") * F.col("vj")),
                ),
                6,
            ).alias("corr"),
        )
    )


def embedding_collapse_report(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-space health check: the distribution of cosine between
    CONSECUTIVE-id vector pairs — a deterministic linear 1-per-row pair
    sample (ids are unordered w.r.t. content, so adjacent ids are an
    arbitrary-but-reproducible pairing; all-pairs is the n² this op
    exists to avoid). A drifting mean toward 1.0 is the classic
    representation-collapse alarm; mean vector norm rides along. One
    equi-join on id+1; cosines use the engine's bit-identical float
    discipline (cosine_expr ≡ _cos_sql). Returns one row:
    ``(n_pairs, mean_cos R6, std_cos R6, frac_high R6, n_vecs,
    mean_norm R6)`` with frac_high = share of pairs with cos > 0.9.
    """
    a = emb.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__va")
    )
    b = emb.select(
        (F.col(id_col) - 1).alias("__id"), F.col(vec_col).alias("__vb")
    )
    cos = a.join(b, "__id").select(
        cosine_expr(F.col("__va"), F.col("__vb")).alias("c")
    )
    pair_stats = cos.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("c").alias("__s"),
        F.sum(F.col("c") * F.col("c")).alias("__s2"),
        F.sum((F.col("c") > 0.9).cast("long")).alias("__hi"),
    )
    norm_stats = emb.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(norm_expr(F.col(vec_col))).alias("__sn"),
    )
    n = F.col("n_pairs").cast("double")
    return pair_stats.crossJoin(F.broadcast(norm_stats)).select(
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round(F.col("__s") / n, 6).alias("mean_cos"),
        F.round(
            F.sqrt(
                F.greatest(
                    F.col("__s2") / n - (F.col("__s") / n) * (F.col("__s") / n),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("std_cos"),
        F.round(F.col("__hi") / n, 6).alias("frac_high"),
        F.col("n_vecs").cast("long").alias("n_vecs"),
        F.round(F.col("__sn") / F.col("n_vecs"), 6).alias("mean_norm"),
    )


def label_noise_audit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    audit: DataFrame | None = None,
    neighbors: DataFrame | None = None,
) -> DataFrame:
    """Label-noise detection by neighborhood vote: a vector whose k
    nearest neighbors majority-vote a DIFFERENT label is a suspect
    annotation — the standard pre-training label audit. Exact brute-force
    neighbors by default (the oracle-checkable demo scale); at corpus
    scale pass ``neighbors`` — any precomputed (query_id, id_col, rank)
    frame, e.g. ``knn_ivf``'s probed output — or call
    :func:`label_noise_audit_ivf`, which wires the sub-quadratic path
    end-to-end (the q27:q30 split, now an actual code path).
    Majority = most common neighbor label, ties broken by smaller label
    (deterministic). ``audit`` restricts WHICH vectors are audited (the
    neighbor pool stays the full ``emb``) — at corpus scale the audit
    runs on a deterministic hash-sample: sample-the-audit,
    keep-the-pool. Returns per true label:
    ``(label, n, n_suspect, suspect_rate R6)``.
    """
    from pyspark.sql import Window

    audited = emb if audit is None else audit
    if neighbors is None:
        q = audited.select(F.col(id_col).alias("query_id"), F.col(vec_col))
        nn = knn_bruteforce(emb, q, id_col, vec_col, "query_id", k)
    else:
        nn = neighbors.filter(F.col("rank") <= k).select("query_id", id_col)
    lab = emb.select(F.col(id_col), F.col(label_col).alias("__nb"))
    votes = (
        nn.join(lab, id_col)
        .groupBy("query_id", "__nb")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("v").desc(), F.col("__nb").asc()
    )
    maj = (
        votes.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("query_id", F.col("__nb").alias("__maj"))
    )
    own = audited.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("__own")
    )
    return (
        maj.join(own, "query_id")
        .groupBy(F.col("__own").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("__maj") != F.col("__own")).cast("long")).alias(
                "n_suspect"
            ),
        )
        .select(
            "label",
            F.col("n").cast("long").alias("n"),
            F.col("n_suspect").cast("long").alias("n_suspect"),
            F.round(F.col("n_suspect") / F.col("n"), 6).alias("suspect_rate"),
        )
    )


def label_noise_audit_ivf(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    audit: DataFrame | None = None,
    num_centroids: int = 16,
    nprobe: int = 4,
    probe_salt: int = 1,
    centroids: DataFrame | None = None,
    preset: str | None = None,
) -> DataFrame:
    """The corpus-scale label-noise audit: the same neighborhood vote as
    :func:`label_noise_audit`, but the neighbor search is IVF-routed —
    ``pick_centroids`` → ``assign_centroids`` (narrow, zero corpus
    shuffle) → ``knn_ivf`` with the SHUFFLE probe strategy
    (``broadcast_probe=False``): the audit sample here is a corpus
    FRACTION, and a corpus-fraction broadcast is exactly the 100 TB OOM
    the brute-force wiring had (VERDICT r13 "What's wrong" #1). Scored
    pair work drops from O(N·N_audit) to O(N_audit · nprobe · N/C) —
    sub-quadratic whenever the centroid count C grows with the corpus
    (the standard IVF sizing, C ≈ √N) — and every join is an equi-join
    on ``centroid_id`` (salt with ``probe_salt`` when C < cluster
    cores). Fully deterministic (hash-picked centroids, tie-ruled
    argmax/rank), so the whole approximate audit hash-matches an
    unrolled DuckDB oracle (q167). Recall vs the exact vote is graded in
    tests; pass trained ``centroids`` (e.g. ``kmeans_centroids``) to
    tighten it.

    ``preset`` (round 16, VERDICT r15 #6 — the measured precision knob
    from ``tools/recall_curve.py`` as API):

    - ``"fast"`` / ``None``: the config as passed — hash-picked
      centroids, the given ``nprobe`` (q167 runs C=16, nprobe=4).
      Measured at sf0.01 vs the exact vote: per-vector vote agreement
      0.366, suspect-flag agreement 0.870, per-label flip mass 0.065.
    - ``"high_precision"``: k-means-trained centroids (3 Lloyd rounds,
      ``kmeans_centroids``) and ``nprobe`` raised to ≥ 8 — ~2× probe
      cost plus the one-off training scans. Measured at sf0.01:
      vote 0.715, flag 0.902, flip mass 0.049 (the full nprobe ×
      centroid curve is in SCALE.md). An explicit ``centroids`` frame
      takes precedence over the preset's training.
    """
    if preset not in (None, "fast", "high_precision"):
        raise ValueError(
            f"preset must be 'fast' or 'high_precision', got {preset!r}"
        )
    if preset == "high_precision":
        nprobe = max(nprobe, 8)
        if centroids is None:
            centroids = kmeans_centroids(
                emb, k=num_centroids, iters=3, id_col=id_col, vec_col=vec_col
            )
    cents = (
        pick_centroids(emb, num_centroids, id_col, vec_col)
        if centroids is None
        else centroids
    )
    # materialized once, in ARRAY form: assignment's argmax and the narrow
    # probe ranking both consume the same one-row array<struct<id,vec,nrm>>
    # — built per consumer it costs the collect_list aggregation (and, when
    # centroids come from pick_centroids, the corpus sample scan) twice;
    # checkpointing the array leaves ONE sample-and-aggregate job and two
    # in-memory broadcasts of identical subtrees (round 18; round 17
    # checkpointed the 16-row table, which still re-aggregated per side)
    arr = centroid_array(cents, "centroid_id", "centroid").localCheckpoint(
        eager=True
    )
    assigned = assign_centroids(emb, cents, id_col, vec_col, cent_arr=arr)
    audited = emb if audit is None else audit
    q = audited.select(F.col(id_col).alias("query_id"), F.col(vec_col))
    nn = knn_ivf(
        assigned,
        cents,
        q,
        id_col,
        vec_col,
        "query_id",
        k=k,
        nprobe=nprobe,
        broadcast_probe=False,
        probe_salt=probe_salt,
        # corpus-fraction query set: probe selection must not exchange
        # (queries × C) replicated vectors — narrow array ranking instead
        narrow_probe=True,
        cent_arr=arr,
    )
    return label_noise_audit(
        emb, id_col, vec_col, label_col, k=k, audit=audited, neighbors=nn
    )


def label_centroid_separation(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Class-separation report: cosine between per-label embedding
    CENTROIDS for every unordered label pair — "which classes are
    semantically entangled?" The audit a classifier-data pass runs
    before trusting its labels (entangled pairs are where q163's
    label-noise suspects concentrate). One posexplode scan reduces to a
    (labels × dims) centroid frame; everything pairwise happens on that
    tiny frame (labels² × dims at most). Returns
    ``(label_a, label_b, n_a, n_b, centroid_cos R6)``.
    """
    flat = emb.select(
        F.col(label_col).alias("lb"),
        F.posexplode(F.col(vec_col)).alias("pos", "v"),
    )
    cent = flat.groupBy("lb", "pos").agg(
        (F.sum(F.col("v").cast("double")) / F.count(F.lit(1))).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    nrm = cent.groupBy("lb").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nr"),
        F.max("n").alias("n"),
    )
    a = cent.select(F.col("lb").alias("la"), "pos", F.col("c").alias("ca"))
    b = cent.select(F.col("lb").alias("lb2"), "pos", F.col("c").alias("cb"))
    dots = (
        a.join(b, "pos")
        .filter(F.col("la") < F.col("lb2"))
        .groupBy("la", "lb2")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    na = nrm.select(F.col("lb").alias("la"), F.col("nr").alias("nra"), F.col("n").alias("n_a"))
    nb = nrm.select(F.col("lb").alias("lb2"), F.col("nr").alias("nrb"), F.col("n").alias("n_b"))
    return (
        dots.join(F.broadcast(na), "la")
        .join(F.broadcast(nb), "lb2")
        .select(
            F.col("la").alias("label_a"),
            F.col("lb2").alias("label_b"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(F.col("dot") / (F.col("nra") * F.col("nrb")), 6).alias(
                "centroid_cos"
            ),
        )
    )


def label_cohesion(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Within-class cohesion: per label, the mean (and worst) cosine of
    member vectors to their OWN label centroid — the within-class
    complement of ``label_centroid_separation`` (between-class): tight
    cohesion + low separation = entangled classes; loose cohesion flags
    a label that is really several concepts. One posexplode scan; the
    per-vector reduction joins the exploded corpus against the broadcast
    (labels × dims) centroid frame on (label, pos) — no row ever meets
    another row. Returns ``(label, n, mean_cos R6, min_cos R6)``.
    """
    flat = emb.select(
        F.col(label_col).alias("lb"),
        F.col(id_col).alias("__rid"),
        F.posexplode(F.col(vec_col)).alias("pos", "v"),
    ).select("lb", "__rid", "pos", F.col("v").cast("double").alias("v"))
    cent = flat.groupBy("lb", "pos").agg(
        (F.sum("v") / F.count(F.lit(1))).alias("c")
    )
    ncl = cent.groupBy("lb").agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nc"))
    per_vec = (
        flat.join(F.broadcast(cent), ["lb", "pos"])
        .groupBy("lb", "__rid")
        .agg(
            F.sum(F.col("v") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nv"),
        )
    )
    cosd = per_vec.join(F.broadcast(ncl), "lb").select(
        "lb", (F.col("dot") / (F.col("nv") * F.col("nc"))).alias("cos")
    )
    return cosd.groupBy("lb").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("cos") / F.count(F.lit(1)), 6).alias("mean_cos"),
        F.round(F.min("cos"), 6).alias("min_cos"),
    ).select(
        F.col("lb").alias(label_col),
        F.col("n").cast("long").alias("n"),
        "mean_cos",
        "min_cos",
    )
