"""Connected components — the cluster-assembly step of near-dup dedup.

``embedding_near_dupes(link="star")`` / LSH candidate pairs emit edges; the
dedup decision ("keep one representative per duplicate class") needs the
transitive grouping of those edges. This is the distributed
min-label-propagation algorithm with pointer jumping:

    label(v) ← v
    repeat:
      hook:     label(v) ← min(label(v), min over neighbors u of label(u))
      compress: label(v) ← label(label(v))          (pointer jumping)
    until no label changes

Hooking alone converges in O(diameter) rounds; the compress step shortcuts
chains so convergence is O(log n) like the path-doubling closure. Each
round is two joins + a groupBy-min on (id, label) pairs — all shuffles on
the label key, localCheckpoint-ed to keep lineage flat. No GraphFrames
dependency; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """(id, component) for every vertex; component = min vertex id reachable.

    ``edges`` are undirected pairs (direction is ignored). Isolated vertices
    don't appear (no edges → no row); callers wanting singletons left-join
    this onto their vertex set and coalesce(component, id).
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )

    def compress(hooked: DataFrame) -> DataFrame:
        """comp ← comp(comp), + the did-anything-change flag. ``hooked``
        carries (id, comp, __old); the flag folds into the SAME
        materialized plan (round 17: no separate probe join per round) and
        the old label rides the hook aggregation itself (round 18: the
        re-attach join on ``labels`` is gone too — labels has exactly one
        row per id, so min(__old) through the union recovers it). The
        parent side projects the same aggregation subtree, so the
        exchange is planned once and reused."""
        parent = hooked.select(
            F.col("id").alias("__pid"), F.col("comp").alias("__pcomp")
        )
        return (
            hooked.join(parent, hooked["comp"] == parent["__pid"], "left")
            .select(
                "id",
                F.coalesce("__pcomp", "comp").alias("comp"),
                (F.coalesce("__pcomp", "comp") != F.col("__old")).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )

    # Round 1 fused (round 18): labels₀(v) = v makes the first hook a plain
    # per-source aggregation — min(v, min over neighbors) — so the
    # init-labels distinct+checkpoint job AND round 1's hook join both
    # disappear (und is symmetric, so the distinct sources ARE the vertex
    # set). __old = id by construction.
    hooked = und.groupBy("a").agg(F.min("b").alias("__mb")).select(
        F.col("a").alias("id"),
        F.least("a", "__mb").alias("comp"),
        F.col("a").alias("__old"),
    )
    for _ in range(max_iterations):
        compressed = compress(hooked)
        stable = compressed.filter(F.col("__chg")).limit(1).isEmpty()
        labels = compressed.select("id", "comp")
        if stable:
            return labels
        # hook: min label over self + neighbors; the previous round's
        # label rides along as __old (null on neighbor rows — min skips)
        nbr = (
            und.join(labels, und["a"] == labels["id"])
            .select(F.col("b").alias("id"), "comp")
            .withColumn("__old", F.lit(None).cast(labels.schema["comp"].dataType))
        )
        hooked = (
            labels.withColumn("__old", F.col("comp"))
            .unionByName(nbr)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"), F.min("__old").alias("__old"))
        )
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )


def dedup_clusters(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """End-to-end exact-dedup clustering: every row labeled with the min id
    of its normalized-text duplicate class — star links per content-hash
    bucket, then connected components. Output: (id, cluster_rep).

    The scalable twin of a window min per hash group (which is also its
    oracle); CC generalizes unchanged to NEAR-dup links (LSH star edges)
    where no single grouping key exists.
    """
    from . import dedup as dd
    from ..functions import hashing

    buckets = df.select(
        F.col(id_col).alias("id"),
        hashing.md5_long(dd.normalize_text(text_col)).alias("__k"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__k")
    links = (
        buckets.withColumn("__rep", F.min("id").over(w))
        .filter(F.col("id") != F.col("__rep"))
        .select(F.col("__rep").alias("id_a"), F.col("id").alias("id_b"))
    )
    comp = connected_components(links)
    return (
        buckets.select("id")
        .join(comp, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("comp", "id").alias("cluster_rep"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    round_to: int = 8,
    assume_no_dangling: bool = False,
    broadcast_max_nodes: int = 1_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list — the node-importance
    primitive of corpus curation (CommonCrawl ranks domains by link
    centrality to pick what to crawl/keep).

    The node set is src ∪ dst, so a directed edge list with sink pages
    (dst-only "dangling" nodes — the dominant shape of a real web graph)
    loses no rank mass: per round the summed rank of dangling nodes is
    redistributed uniformly (the canonical random-surfer teleport from a
    dead end), keeping Σ rank ≈ 1 by construction instead of by caller
    contract. The dangling sum is a one-row aggregate broadcast back into
    the update — metadata-scale, like N. For a symmetric (undirected)
    edge feed the dangling set is empty and the iteration is identical to
    the src-only form (q85's oracle is unchanged).

    Each round is the canonical shape: ranks ⋈ out-degree-weighted edges
    → per-destination partial-aggregated SUM — all hash exchanges on the
    node key, so a production deployment pre-partitions (or buckets) the
    edge table by ``src`` once and every round reuses that layout; ranks
    are localCheckpoint-ed per round to keep lineage flat (the q14/closure
    discipline). No driver-side data loops — the only driver scalar is
    N = |nodes| (metadata-scale, like closure's convergence count).

    Determinism contract: ranks round to ``round_to`` decimals after every
    round on BOTH engines (per-node SUM order is the only cross-engine
    drift source; one round's drift is ~1e-16, far below the 1e-8 lattice),
    so a round-unrolled SQL oracle can value-check the full iteration —
    the q54/q74 pattern.

    Output: (node, rank) — one row per node, Σ rank ≈ 1.
    """
    # The input plan is executed EXACTLY ONCE: the raw edge list is
    # materialized first, then out-degree is a partial-aggregated count of
    # (src, n) rows — metadata-scale — joined back in (broadcast below the
    # node threshold, so the edge table never moves for the degree fold;
    # guide §2.3: shuffle keys/counts, not the payload table. The previous
    # count-over-src window shuffled AND sorted the FULL edge table to
    # attach one long — round-17 measured 1.9 s → 0.6 s on q85's build).
    # Callers whose edge list is an expensive derived plan (q85's
    # join+distinct+union) are not rescanned; a production deployment
    # pre-partitions/buckets the weighted table by ``__src``
    # (write_pagerank_edges) so every round reuses one layout.
    ee = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst")
    ).localCheckpoint(eager=True)
    deg = (
        ee.groupBy("__src")
        .agg(F.count(F.lit(1)).alias("__od"))
        .localCheckpoint(eager=True)
    )
    n_src = deg.count()
    bc_deg = n_src <= broadcast_max_nodes
    wedges = ee.join(F.broadcast(deg) if bc_deg else deg, "__src")
    return _pagerank_rounds(
        wedges, iters, damping, round_to, assume_no_dangling,
        broadcast_max_nodes,
        src_nodes=deg.select(F.col("__src").alias("node")),
        n_src=n_src,
    )


def write_pagerank_edges(
    edges: DataFrame,
    table_name: str,
    num_buckets: int = 16,
    src: str = "src",
    dst: str = "dst",
    path: str | None = None,
) -> None:
    """Persist the out-degree-weighted edge table BUCKETED by ``__src`` —
    the production layout pagerank's docstring names: fold the degree in
    once, pay the layout shuffle once, and every later pagerank run (and
    every round within it) reads a table whose partitioning already
    matches the per-round join key, so the edge side of the iteration
    exchanges NOTHING (pinned by
    tests/test_plans.py::test_pagerank_bucketed_edges_one_sided_exchange).
    """
    from pyspark.sql import Window

    from ..sources.io import write_bucketed

    wedges = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst")
    ).withColumn("__od", F.count(F.lit(1)).over(Window.partitionBy("__src")))
    write_bucketed(
        wedges, table_name, ["__src"], num_buckets=num_buckets,
        sort_cols=["__src"], path=path,
    )


def pagerank_table(
    spark,
    table_name: str,
    iters: int = 3,
    damping: float = 0.85,
    round_to: int = 8,
    assume_no_dangling: bool = False,
    broadcast_max_nodes: int = 1_000_000,
) -> DataFrame:
    """PageRank over a ``write_pagerank_edges`` table. Identical semantics
    and output to ``pagerank`` (same round arithmetic — tested equal);
    the difference is physical: the bucketed layout replaces the
    in-memory localCheckpoint, so beyond-broadcast-scale graphs run
    rounds with the exchange on the RANKS side only — the edge table,
    the side that's petabytes at web scale, never moves."""
    return _pagerank_rounds(
        spark.table(table_name), iters, damping, round_to,
        assume_no_dangling, broadcast_max_nodes,
    )


def _round_contribs(wedges: DataFrame, ranks: DataFrame, bc: bool) -> DataFrame:
    """One round's inflow aggregation — module-level so the plan-shape
    test can pin the join strategy of the exact code path the iteration
    runs (the checkpointed final ranks hide the per-round plan)."""
    r = F.broadcast(ranks) if bc else ranks
    return (
        wedges.join(r, wedges["__src"] == r["node"])
        .select(
            F.col("__dst").alias("node"),
            (F.col("rank") / F.col("__od")).alias("__c"),
        )
        .groupBy("node")
        .agg(F.sum("__c").alias("__s"))
    )


def _pagerank_rounds(
    wedges: DataFrame,
    iters: int,
    damping: float,
    round_to: int,
    assume_no_dangling: bool,
    broadcast_max_nodes: int,
    src_nodes: DataFrame | None = None,
    n_src: int | None = None,
) -> DataFrame:
    """Shared iteration over a (__src, __dst, __od) table.

    ``src_nodes``/``n_src``: callers that already hold the source-node set
    (pagerank's degree fold produces it as a by-product) pass it in so the
    table isn't re-scanned for a distinct; table-backed callers
    (pagerank_table) leave them None and pay the one distinct scan.
    """
    if src_nodes is None:
        src_nodes = (
            wedges.select(F.col("__src").alias("node"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_src = src_nodes.count()
    # dst-only nodes have no out-edges: their rank teleports uniformly
    # each round instead of silently draining out of the distribution.
    # src_nodes IS the has-out-edges set by construction, so the dangling
    # set is one dst-distinct anti-join over ``wedges`` (for pagerank()
    # callers a lazy ee⋈deg join over the two checkpointed tables — the
    # deg broadcast build re-executes here and per round, metadata-scale
    # both times; for pagerank_table callers the bucketed table itself)
    # — detected ONCE, and the common symmetric-feed case (q85) pays
    # neither the per-round mass aggregate nor a doubled node-distinct
    # (both measured: +70% on the bench when every round carried the
    # invariantly-zero term).
    # ``assume_no_dangling=True`` skips the detection job for callers
    # whose edge list is all-sources BY CONSTRUCTION (a symmetric feed
    # like q85's union-with-reverse) — the detection is correctness
    # insurance, and provably-symmetric callers shouldn't pay it.
    if assume_no_dangling:
        dangling, n_dangling = None, 0
    else:
        dangling = (
            wedges.select(F.col("__dst").alias("node"))
            .distinct()
            .join(src_nodes, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        n_dangling = dangling.count()
    has_dangling = n_dangling > 0
    nodes = src_nodes.unionByName(dangling) if has_dangling else src_nodes
    n_nodes = n_src + n_dangling
    base = (F.lit(1.0) - F.lit(damping)) / F.lit(float(n_nodes))
    ranks = nodes.select(
        "node", F.round(F.lit(1.0) / F.lit(float(n_nodes)), round_to).alias("rank")
    )
    # Every round eager-checkpoints ranks. A lazy no-per-round-checkpoint
    # variant (rounds nested as one linear plan, broadcasts built on
    # demand) was MEASURED SLOWER in round 17 — 5.6 s vs 4.7 s on q85
    # (the 3-deep nested broadcast builds re-execute upstream rounds) —
    # and rejected; don't re-try it without a new measurement
    # (OPTIMIZATION_r17.md "q85 pagerank").
    ranks = ranks.localCheckpoint(eager=True)
    # Per-round join strategy: ranks is |nodes|-sized — typically MANY
    # orders smaller than the edge table (1M-node graph ≈ tens of MB of
    # (node, rank) rows vs billions of edges). Below the threshold the
    # round's join BROADCASTS ranks, so the edge table never shuffles:
    # each round is a map-side hash join over the (once-materialized)
    # wedges + a partial-aggregated exchange of ≤ |nodes| rows per
    # partition. Above it (web-scale graphs, 10⁹+ nodes) both sides
    # shuffle on the node key and the pre-partitioned/bucketed wedges
    # layout is what keeps the exchange one-sided.
    bc = n_nodes <= broadcast_max_nodes
    for _ in range(iters):
        contribs = _round_contribs(wedges, ranks, bc)
        updated = nodes.join(
            F.broadcast(contribs) if bc else contribs, "node", "left"
        )
        if has_dangling:
            # one-row dangling-mass aggregate, broadcast into the update
            dmass = F.broadcast(
                ranks.join(dangling, "node", "left_semi").agg(
                    F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
                )
            )
            inflow = F.coalesce("__s", F.lit(0.0)) + F.col("__dm") / F.lit(
                float(n_nodes)
            )
            updated = updated.crossJoin(dmass)
        else:
            inflow = F.coalesce("__s", F.lit(0.0))
        ranks = updated.select(
            "node",
            F.round(base + F.lit(damping) * inflow, round_to).alias("rank"),
        )
        ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph —
    the local-clustering primitive (community density, link-spam scoring
    for crawl curation; the reference's graph surface stops at closure,
    src/import_ontology.py:59-103, this extends it to cohesion metrics).

    The classic distributed formulation (Suri & Vassilvitskii 2011,
    "Counting Triangles and the Curse of the Last Reducer"): orient every
    edge from its lower-rank to higher-rank endpoint under the DEGREE
    ordering rank(v) = (deg(v), v). Out-degrees under this orientation
    are O(√m)-bounded, so the wedge join does O(m^1.5) work total instead
    of Σ deg² — a single celebrity hub with 10⁷ neighbors contributes
    wedges only through its (few) higher-degree peers, not 10¹⁴ pairs.
    The id tiebreak makes the orientation total and deterministic, so the
    whole pipeline is value-checkable against a same-orientation SQL
    oracle (q99).

    Plan shape: canonicalize+distinct (one shuffle), degree count (one
    shuffle), orient (two AQE-broadcast joins against the |V|-row degree
    table), then the EDGE-ITERATOR close: out-neighbor adjacency arrays
    per node (collect_list — group size is the oriented out-degree, so
    O(√m)-bounded, hub-proof), attach both endpoints' arrays to each
    oriented edge, and emit each edge's triangles as
    ``array_intersect(N⁺(u), N⁺(v))`` row-locally. A w in both arrays
    means edges u→w and v→w exist, closing {u,v,w} exactly once (at its
    two lowest-rank corners' edge). The naive alternative — self-join to
    enumerate wedges, semi-join against the edge set — EXCHANGES every
    wedge: 41M rows for the 1.2M-edge sf0.1 graph (measured 2.4× slower);
    here the wedge space is traversed inside the intersection hash probe
    and only actual triangles (then their 3 exploded corners) hit a
    shuffle. Every exchange key is a node id — bucketing the oriented
    edge table by ``u`` co-locates the adjacency join at production scale.

    Output: (node, n_triangles) for every node in ≥ 1 triangle.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("__da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("__db"))
    a_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    # oriented edge u→w with rank(u) < rank(w); w ∈ N⁺(v) already implies
    # rank(v) < rank(w), so no degree needs to ride along past this point
    oe = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("w"),
        )
        .localCheckpoint(eager=True)
    )
    adj = oe.groupBy("u").agg(F.collect_list("w").alias("__nbrs"))
    eu = oe.select("u", "w").join(adj, "u")
    ev = eu.join(
        adj.select(F.col("u").alias("w"), F.col("__nbrs").alias("__nv")),
        "w",
    )
    tris = ev.select(
        "u",
        F.col("w").alias("__v"),
        F.explode(F.array_intersect("__nbrs", "__nv")).alias("__w2"),
    )
    return (
        tris.select(
            F.explode(F.array("u", "__v", "__w2")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def golden_records(
    members: DataFrame,
    entity_col: str,
    mode_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    carry: tuple[list[str], list[str]] | None = None,
) -> DataFrame:
    """Survivorship / golden-record construction — the step AFTER entity
    resolution (q117's clusters): collapse each entity's member rows into
    one canonical record under explicit, deterministic field rules.

    - ``mode_cols``: most FREQUENT value per entity wins; frequency ties
      break lexicographically-smallest (deterministic across engines —
      never an engine's unspecified ``mode()`` tie).
    - ``max_cols``: plain per-entity MAX (monotone fields: last-seen
      timestamps, balances-as-high-water).
    - ``carry`` = (order_cols, value_cols): the value_cols are carried
      together from the single member row maximizing the order_cols
      tuple (lexicographic) — "freshest address wins, as a unit" —
      keeping multi-field consistency a per-field rule would break.
      The order tuple should be a total order within each entity
      (append a unique key column as the last element).

    Scale shape: each rule family is one aggregation co-partitioned on
    the entity key (mode adds a (entity, value) pre-count — the same
    two-step any heavy-hitter count uses), joined back entity-to-entity —
    no windows over raw members except the mode's per-entity value
    ranking, which runs on the COUNTED rows (distinct values), not the
    members.
    """
    from pyspark.sql import Window

    mode_cols = mode_cols or []
    max_cols = max_cols or []
    out = members.select(entity_col).distinct()
    for c in mode_cols:
        counts = (
            members.filter(F.col(c).isNotNull())
            .groupBy(entity_col, c)
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        w = Window.partitionBy(entity_col).orderBy(
            F.col("__n").desc(), F.col(c).asc()
        )
        top = (
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(entity_col, F.col(c).alias(f"golden_{c}"))
        )
        out = out.join(top, entity_col, "left")
    if max_cols:
        aggs = [F.max(c).alias(f"max_{c}") for c in max_cols]
        out = out.join(members.groupBy(entity_col).agg(*aggs), entity_col, "left")
    if carry is not None:
        order_cols, value_cols = carry
        carried = members.groupBy(entity_col).agg(
            F.max_by(
                F.struct(*[F.col(c) for c in value_cols]),
                F.struct(*[F.col(c) for c in order_cols]),
            ).alias("__c")
        )
        out = out.join(
            carried.select(
                entity_col,
                *[F.col(f"__c.{c}").alias(f"carried_{c}") for c in value_cols],
            ),
            entity_col,
            "left",
        )
    n = members.groupBy(entity_col).agg(F.count(F.lit(1)).alias("n_members"))
    return out.join(n, entity_col, "left")
