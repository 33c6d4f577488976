"""Distributed graph analytics on DataFrames: triangle counting and
PageRank.

The reference has no graph code (its only code file is
class.nmea.parser.php:1-399; SURVEY §0) — engine surface (`ext`),
rounding out the iterative-algorithm family started by
``connected_components``.

Both operators take a plain edge-list DataFrame — graphs at 100 TB are
stored exactly like any other fact table, and both algorithms reduce to
joins + aggregations that Catalyst/AQE handle like any other query:

- ``triangle_count``: node-ordered adjacency intersection (each
  triangle counted once via a < b < c) — one groupBy to build
  greater-neighbor arrays, one join to pair each edge with its
  endpoint's array, and a JVM ``array_intersect`` instead of a wedge
  materialization.
- ``pagerank``: power iteration — per round, one join (ranks × edges)
  and one aggregation (contributions per destination). Lineage is
  truncated per round (``localCheckpoint``), the same discipline as
  ``connected_components``. Dangling-node mass is redistributed
  uniformly each round so ranks keep summing to 1.
- ``label_propagation`` / ``bfs_distances``: see their docstrings —
  the same per-round join + checkpoint discipline, with node-sized
  sides (labels / frontier) riding the shared size-gated broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fits_broadcast(n_rows: int) -> bool:
    """Size gate shared by the iterative operators' node-sized join
    sides (pagerank ranks, LPA labels), against the engine's 64 MB
    broadcast threshold (registry.tune_session sets
    spark.sql.autoBroadcastJoinThreshold to the same constant). The
    raw (id, payload) row is ~32 B, but ``F.broadcast()`` is a HINT
    that bypasses Catalyst's size enforcement, and the driver-built
    BroadcastHashJoin relation costs several times the payload (UnsafeRow
    + LongHashedRelation map overhead) — so the gate budgets
    ``_BROADCAST_ROW_OVERHEAD`` (4x) bytes per row, admitting ~500k
    rows rather than the ~2M a payload-only estimate would wave
    through near the memory-pressure edge (ADVICE r6). Past the gate
    the side must shuffle and the production layout co-partitions it
    with the edges instead. One definition so the two gates and the
    session threshold cannot drift independently."""
    return n_rows * 32 * _BROADCAST_ROW_OVERHEAD <= _BROADCAST_THRESHOLD_BYTES


# Mirrors registry.tune_session's autoBroadcastJoinThreshold.
_BROADCAST_THRESHOLD_BYTES = 64 * (1 << 20)
# Hashed-relation blow-up over the 32 B/row payload estimate: measured
# BroadcastExchange "data size" for a 1M-row (long, double) relation is
# 39.6 MiB (~41 B/row serialized UnsafeRows) BEFORE the driver builds
# the LongHashedRelation map (pointer pages roughly double that again),
# so 4x (128 B/row) bounds the real driver+executor footprint.
_BROADCAST_ROW_OVERHEAD = 4


def _degree_stats_of(e: DataFrame) -> tuple[int, int]:
    """(max degree, edge count) of a normalized (a<b, distinct)
    undirected edge table — the skew-gate statistic. One explode +
    hash-agg + 1-row collect."""
    deg = (
        e.select(F.col("a").alias("id"))
        .union(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    stat = deg.agg(
        F.max("deg").alias("max_deg"), F.sum("deg").alias("deg_sum")
    ).collect()[0]  # 1-row stats aggregate
    return int(stat["max_deg"] or 0), int(stat["deg_sum"] or 0) // 2


def degree_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> tuple[int, int]:
    """Public skew-gate statistic for an ARBITRARY edge list: applies
    the same normalization as :func:`triangle_count` (least/greatest,
    drop self-loops, distinct) then computes (max_deg, m). Callers
    that land their edge lists persist this pair beside the landed
    files (keyed by the landing fingerprint) and pass it back via
    ``triangle_count(..., stats=...)`` so repeated runs skip the
    blocking stats job."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return _degree_stats_of(e)


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    stats: tuple[int, int] | None = None,
) -> DataFrame:
    """Count triangles in the undirected graph given by ``edges``
    (duplicates/self-loops/direction are normalized away). Returns a
    1-row DataFrame ``n_triangles: bigint``.

    Node-ordered adjacency formulation: normalize every edge to
    (a < b), group into greater-neighbor arrays nbrs(a) = {b : a < b,
    (a,b) in E}, then for each edge (a, b) count the common greater
    neighbors |nbrs(a) ∩ nbrs(b)| — exactly the triangles a < b < c,
    each counted once. One groupBy shuffle + ONE edge-keyed join (the
    (edge, nbrs(a)) pairs fall out of exploding the adjacency itself —
    no e ⋈ adj join needed), with the closing-edge check done by a
    JVM ``array_intersect`` instead of materializing the wedge set.
    Replaced the r1-r4 3-way wedge self-join (two shuffle joins + a
    semi-join): measured at sf0.1, medians of 5 interleaved trials,
    wedge join 4.8s vs adjacency-intersect 3.1s — and the wedge
    formulation shuffles O(sum deg^2) rows where this shuffles
    O(m) arrays totaling O(sum deg) elements.

    Skew gate: on *skewed* graphs (hub degree >> sqrt(m)) id-ordered
    arrays blow up — a hub with degree d materializes a d-element array
    and d copies of it through the join. The classic fix is to orient
    every edge by the total order (degree, id) instead of id, which
    bounds every greater-neighbor array at O(sqrt(m)). That costs a
    degree computation + two annotation joins, which on near-regular
    graphs like the co-purchase fixture (max/avg degree < 2 at every
    SF) buy nothing — measured slower. So the operator computes the
    degree table (needed for the gate anyway — one explode + hash-agg
    + 1-row max over it), picks the orientation via
    :func:`_use_degree_orientation` (hub test: max_deg > 2·sqrt(2m)),
    and only pays the annotation joins when a hub actually exists. The
    count is orientation-invariant (pytest pins both paths equal on a
    synthetic hub graph), so oracles may use a<b<c either way."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if stats is None:
        max_deg, m = _degree_stats_of(e)
    else:
        # Caller-supplied (max_deg, m) — e.g. persisted beside a landed
        # edge list keyed by its source fingerprint (graph_queries),
        # so repeat calls skip the blocking stats job (VERDICT r12
        # item 6). The gate only needs the hub TEST, so a stats pair
        # from the same edge set is exact, not approximate.
        max_deg, m = stats
    if _use_degree_orientation(max_deg, m):
        # degree table only needed on this (skewed) path — recomputed
        # here rather than kept from the gate, so the near-regular
        # fast path pays nothing for it
        deg = (
            e.select(F.col("a").alias("id"))
            .union(e.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("deg"))
        )
        # (degree, id)-oriented: u -> v iff (deg(u), u) < (deg(v), v).
        # For a triangle x ≺ y ≺ z the three edges orient x->y, x->z,
        # y->z, and only the (x, y) edge sees z in both out-neighbor
        # sets — each triangle counted exactly once, arrays O(sqrt(m)).
        da = deg.select(F.col("id").alias("a"), F.col("deg").alias("dega"))
        db = deg.select(F.col("id").alias("b"), F.col("deg").alias("degb"))
        a_first = (F.col("dega") < F.col("degb")) | (
            (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
        )
        oriented = (
            e.join(da, "a")
            .join(db, "b")
            .select(
                F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
                F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            )
        )
    else:
        oriented = e.select(F.col("a").alias("u"), F.col("b").alias("v"))
    # Two consumers (explode branch, join branch) — materialize the
    # (often expensive) edge derivation + groupBy once.
    adj = (
        oriented.groupBy("u")
        .agg(F.collect_list("v").alias("nbrs"))
        .localCheckpoint(eager=True)
    )
    # explode(adj) IS the edge list annotated with nbrs(u) — no join.
    lhs = adj.select(F.explode("nbrs").alias("v"), F.col("nbrs").alias("na"))
    # Adjacency is fact-sized: never broadcast it (a generous session
    # threshold would collect it to the driver), and skip SMJ's sorts —
    # the equi-join only needs hashing.
    rhs = adj.select(F.col("u").alias("v"), F.col("nbrs").alias("nb")).hint(
        "shuffle_hash"
    )
    return lhs.join(rhs, "v").agg(
        F.coalesce(F.sum(F.size(F.array_intersect("na", "nb"))), F.lit(0))
        .cast("bigint")
        .alias("n_triangles")
    )


def _use_degree_orientation(max_deg: int, m: int) -> bool:
    """Skew gate for :func:`triangle_count`: True iff a hub exists —
    max degree above 2·sqrt(2m), the threshold where an id-ordered
    greater-neighbor array stops being O(sqrt(m))-bounded in practice.
    Near-regular graphs (the fixtures: max/avg degree < 2) stay on the
    cheaper id orientation; a star-like graph flips to (degree, id)."""
    return m > 0 and max_deg * max_deg > 8 * m


def label_propagation(
    edges: DataFrame,
    n_iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation community detection over an
    undirected edge list; returns (``id``, ``label``) for every
    non-isolated node. Init label = own id; each round every node
    adopts the most frequent label among its neighbors, ties broken by
    the smallest label — fully deterministic (the classic LPA tie-break
    fix), so a fixed iteration count has an exact relational oracle.

    Per round: one edge ⋈ labels join + two hash aggregations
    (per-(node, label) counts, then per-node argmax via a struct min).
    Same per-round localCheckpoint discipline as pagerank — the labels
    table is node-sized; only the symmetrized edge join shuffles
    edge-sized data. Unlike connected components (min-label flood =
    one component per connected subgraph), frequency voting keeps
    dense local clusters as separate communities."""
    a = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d")).filter(
        F.col(src_col).isNotNull()
        & F.col(dst_col).isNotNull()
        & (F.col(src_col) != F.col(dst_col))
    )
    sym = (
        a.union(a.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
        # when labels does NOT broadcast (past the size gate), both
        # sides of the per-round join are treated as fact-sized: hash,
        # never sort (same measured rationale as pagerank)
        .hint("shuffle_hash")
    )
    labels = sym.select(F.col("s").alias("id")).distinct().select(
        "id", F.col("id").alias("lbl")
    )
    bcast_labels = False
    for it in range(n_iterations):
        if it == 0:
            # Identity-init peel: in round 1 every neighbor's label IS
            # the neighbor id, and sym pairs are distinct, so every
            # (node, label) count is exactly 1 and the frequency argmax
            # (count desc, label asc) degenerates to min neighbor id —
            # one aggregation, no join (measured ~30% off the 3-round
            # loop at bench SF). Rounds 2+ run the general vote.
            labels = (
                sym.groupBy("s")
                .agg(F.min("d").alias("lbl"))
                .select(F.col("s").alias("id"), "lbl")
                .localCheckpoint(eager=True)
            )
            # The labels side is NODE-sized: when it fits a broadcast
            # (~32 B/row vs the 64 MB threshold → up to ~2M nodes),
            # sending it to sym's partitions skips re-shuffling the
            # symmetrized edge fact every round — the pagerank
            # broadcast-ranks rationale. Measured at sf0.1 (16k nodes,
            # 1.17M sym edges; 5 interleaved trials): 2.27s vs 2.69s
            # median, identical labels. Counting the checkpointed
            # node-sized table is a cheap driver scalar.
            bcast_labels = _fits_broadcast(labels.count())
            continue
        lhs = F.broadcast(labels) if bcast_labels else labels
        counts = (
            sym.join(lhs, sym.d == labels.id)
            .groupBy(sym.s, "lbl")
            .agg(F.count("*").alias("c"))
        )
        # argmax by (count desc, label asc) == lexicographic struct min
        labels = (
            counts.groupBy("s")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("lbl").alias("l"))
                ).alias("m")
            )
            .select(F.col("s").alias("id"), F.col("m.l").alias("lbl"))
            .localCheckpoint(eager=True)
        )
    return labels.select("id", F.col("lbl").alias("label"))


def pagerank(
    edges: DataFrame,
    n_iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list. Returns
    (``id``, ``rank``) for every node (sources and sinks), ranks
    summing to 1 up to float error. Deterministic up to floating-point
    reassociation in the per-destination contribution sums (~1e-15 per
    round — pytest pins against an exact driver-side replica at 1e-9)."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        # NULL endpoints are not edges — and a NULL dst group would be
        # ambiguous with the rollup grand-total row below
        .filter(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    # Loop-invariant prework, materialized once: the edge list annotated
    # with its source's out-degree (what each round actually joins).
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    e_deg = (
        e.join(out_deg, "src")
        .select("src", "dst", "deg")
        # localCheckpoint, NOT repartition(key).persist(): checkpointing
        # does erase partitioning info (so each round re-shuffles e_deg),
        # but the partitioning-preserving persist variant measured SLOWER
        # at sf0.1 (tools/bench_pagerank.py, medians of 3 interleaved
        # trials: 4.9s vs 4.5s) — at this graph size the rounds are
        # fixed-overhead bound, and cache scans cost more than the tiny
        # re-shuffles they avoid. Re-measure before "fixing" this.
        .localCheckpoint(eager=True)
        # The per-round ranks × e_deg join when ranks does NOT broadcast:
        # e_deg is fact-sized (never broadcast itself — a generous
        # threshold would re-collect it to the driver every round) and
        # the join only needs hashing, not SMJ's sorts. Measured at
        # sf0.1: 10-round pagerank median 3.9s (shuffle_hash) vs 4.1
        # (merge) vs 5.8s (auto under a 64 MB threshold).
        .hint("shuffle_hash")
    )
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    # Join strategy for ranks × e_deg, picked from n (already counted):
    # the ranks side is NODE-sized — when it fits a broadcast (~32 B/row
    # against the session's 64 MB threshold → up to ~2M nodes), sending
    # it to the e_deg partitions skips the per-round shuffle of the
    # edge fact entirely (e_deg's checkpoint erased its partitioning,
    # so the hash join re-shuffles ~m rows every round otherwise).
    # Measured at sf0.1 (16k nodes, 587k edges; 5 interleaved trials):
    # broadcast-ranks median 8.6s vs shuffle_hash 10.1s, best 7.9 vs
    # 9.9. Beyond the gate (a billion-node graph) ranks must shuffle —
    # there the production layout co-partitions ranks and edges on
    # src so the per-round exchange is ranks-sized only.
    bcast_ranks = _fits_broadcast(n)

    for _ in range(n_iterations):
        lhs = F.broadcast(ranks) if bcast_ranks else ranks
        # One shuffle per round: rollup("dst") yields the per-destination
        # contribution sums AND the global sum in the same aggregation.
        # Dangling mass (rank parked on nodes with no outgoing edges)
        # falls out as 1 - total distributed mass — ranks always sum to
        # 1 — so no separate anti-join for it. The rollup result is
        # checkpointed eagerly: it has TWO consumers (per-dst branch,
        # 1-row dangling branch) and feeds the next round's join — left
        # lazy, each round would re-execute the join+rollup subtree per
        # consumer (measured 2-3× blowup compounding across rounds).
        # With it materialized, the ranks plan stays one join deep, so
        # no separate ranks checkpoint is needed at all: 10 rounds = 10
        # small materialization jobs over node-count-sized data.
        # Measured-and-rejected (r7): checkpointing every SECOND round
        # (5 jobs, the skipped round's 2-consumer subtree re-executed
        # inside the next job) — identical ranks, medians of 5
        # interleaved trials at sf0.1: 5.46s vs 5.40s for this form
        # (tools/bench_pagerank.py::pagerank_2per). Job-launch overhead
        # at this SF is already below one round's compute, so halving
        # the job count buys nothing and the extra re-execution costs.
        dist = (
            lhs.join(e_deg, ranks.id == e_deg.src)
            .select(F.col("dst"), (F.col("rank") / F.col("deg")).alias("contrib"))
            .rollup("dst")
            .agg(F.sum("contrib").alias("s"), F.grouping("dst").alias("g"))
            .localCheckpoint(eager=True)
        )
        # grouping() (not dst IS NULL) distinguishes the grand-total row
        # robustly — NULL edges are filtered at normalization, but the
        # flag keeps this correct even if that invariant ever changes.
        inbound = dist.filter(F.col("g") == 0).select(
            F.col("dst").alias("id"), F.col("s").alias("inbound")
        )
        # The rollup's grand-total row; empty edge set → s is NULL → all
        # mass is dangling.
        dangling = dist.filter(F.col("g") == 1).select(
            (F.lit(1.0) - F.coalesce(F.col("s"), F.lit(0.0))).alias("dm")
        )
        ranks = (
            nodes.join(inbound, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce("inbound", F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
        )
    return ranks


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    n_rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Multi-source BFS hop distances over an undirected edge list:
    returns (``id``, ``dist``) for every node within ``n_rounds`` hops
    of any seed (dist 0 = the seeds themselves, capped frontier
    expansion — the bounded-radius neighborhood query).

    FRONTIER-based, the textbook distributed-BFS shape: each round
    joins only the newly-discovered frontier against the edges (never
    the full visited set), anti-joins out already-visited nodes, and
    checkpoint-truncates lineage like the other iterative operators.
    Work per round is O(edges touching the frontier); total O(m) over
    the whole run — a visited-set join per round would be O(m * rounds).
    The frontier is node-sized, so it rides the same size-gated
    broadcast as pagerank's ranks (``_fits_broadcast``); past the gate
    it shuffles and the production layout co-partitions frontier with
    the symmetrized edges. Deterministic: hop distance is a pure
    min-over-paths property, independent of traversal order."""
    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .filter(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull())
        .union(
            edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")).filter(
                F.col(src_col).isNotNull() & F.col(dst_col).isNotNull()
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
        .hint("shuffle_hash")
    )
    nodes = sym.select(F.col("s").alias("id")).distinct()
    # seeds restricted to graph nodes: an absent seed has no distance
    frontier = (
        seeds.select(F.col(seeds.columns[0]).alias("id"))
        .distinct()
        .join(nodes, "id", "left_semi")
        .localCheckpoint(eager=True)
    )
    dist = frontier.select("id", F.lit(0).alias("dist"))
    for r in range(1, n_rounds + 1):
        n_frontier = frontier.count()  # feeds the gate AND the early exit
        if n_frontier == 0:
            break  # exhausted before the cap: further rounds are no-ops
        fr = F.broadcast(frontier) if _fits_broadcast(n_frontier) else frontier
        discovered = (
            sym.join(fr, sym.s == fr.id)
            .select(F.col("d").alias("id"))
            .distinct()
            .join(dist, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        dist = dist.union(discovered.select("id", F.lit(r).alias("dist")))
        frontier = discovered
    return dist


def sssp_distances(
    edges: DataFrame,
    seeds: DataFrame,
    n_rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
) -> DataFrame:
    """Multi-source WEIGHTED shortest paths over an undirected
    weighted edge list — bounded-round Bellman-Ford, the classic the
    hop-count BFS (:func:`bfs_distances`) cannot answer. Returns
    (``id``, ``dist``) for every node whose shortest weighted
    distance from any seed is settled within ``n_rounds`` relaxation
    rounds (dist 0 = the seeds; ``n_rounds`` bounds path LENGTH in
    edges, the oracle-replicable contract of the kcore/pagerank
    fixed-round discipline).

    FRONTIER-based relaxation (delta-stepping's frontier insight
    applied to plain Bellman-Ford): each round relaxes only the edges
    leaving nodes whose distance IMPROVED last round — never the full
    settled set — then min-merges candidates into the distance table
    and early-exits when no node improves (the fixpoint). Work per
    round is O(edges touching the frontier); a full-relaxation
    Bellman-Ford would be O(m × rounds). The frontier is node-sized
    and rides the same measured broadcast gate as pagerank's ranks;
    past the gate it shuffles, co-partitioned with the symmetrized
    edges. All-integer weights and distances — MIN over integer path
    sums is exact and traversal-order-independent, so the rounds
    unroll as materialized DuckDB CTEs."""
    sym = (
        edges.select(
            F.col(src_col).alias("s"), F.col(dst_col).alias("d"), F.col(w_col).alias("w")
        )
        .union(
            edges.select(
                F.col(dst_col).alias("s"), F.col(src_col).alias("d"), F.col(w_col).alias("w")
            )
        )
        .localCheckpoint(eager=True)
        .hint("shuffle_hash")
    )
    nodes = sym.select(F.col("s").alias("id")).distinct()
    frontier = (
        seeds.select(F.col(seeds.columns[0]).alias("id"))
        .distinct()
        .join(nodes, "id", "left_semi")
        .select("id", F.lit(0).cast("bigint").alias("dist"))
        .localCheckpoint(eager=True)
    )
    dist = frontier
    for _ in range(n_rounds):
        n_frontier = frontier.count()  # feeds the gate AND the early exit
        if n_frontier == 0:
            break  # fixpoint: no distance improved last round
        fr = F.broadcast(frontier) if _fits_broadcast(n_frontier) else frontier
        cand = (
            sym.join(fr, sym["s"] == fr["id"])
            .groupBy(sym["d"].alias("id"))
            .agg(F.min(fr["dist"] + sym["w"]).alias("nd"))
        )
        improved = (
            cand.join(dist.select("id", F.col("dist").alias("__old")), "id", "left")
            .filter(F.col("__old").isNull() | (F.col("nd") < F.col("__old")))
            .select("id", F.col("nd").alias("dist"))
            .localCheckpoint(eager=True)
        )
        dist = dist.join(improved, "id", "left_anti").union(improved)
        frontier = improved
    return dist


def kcore_edges(edges: DataFrame, k: int = 2, rounds: int = 6) -> DataFrame:
    """k-core peeling: drop nodes with degree < k, restrict edges to
    surviving endpoints, repeat ``rounds`` times; returns the surviving
    (src, dst) edge set. A FIXED round count keeps the computation
    oracle-replicable (the unroll discipline of :func:`pagerank` /
    :func:`label_propagation`); convergence inside the budget is
    pytest-pinned at the verification SFs, and the operator's contract
    is 'rounds of peeling' — exact on both engines, converged or not.

    Scale: per round one degree hash-agg over 2|E| node ids (map-side
    partial) plus two node-id equi joins — ids shuffle, never
    attributes; lineage truncated per round with an eager
    localCheckpoint exactly like the other iterative graph loops. The
    round count needed is the graph's degeneracy-peeling depth, small
    for the power-law graphs this targets."""
    e = edges.select("src", "dst")
    for _ in range(rounds):
        deg = (
            e.select(F.col("src").alias("n"))
            .unionAll(e.select(F.col("dst").alias("n")))
            .groupBy("n")
            .agg(F.count("*").alias("d"))
        )
        # Fixpoint check BEFORE paying the filter joins — result-
        # identical to running every budgeted round: when no node is
        # below k the round is the identity, and so is every round
        # after it (the oracle's remaining unrolled rounds are no-ops
        # on the same set). One 1-row aggregate collect per round
        # (bounded by contract, the q_join_bloom argument); dense
        # graphs are often ALREADY k-cores, where this turns 6 rounds
        # of join+checkpoint into a single degree aggregate (measured
        # 4.9-7.3s -> ~1s at sf0.1 in-suite).
        total, kept = deg.agg(
            F.count("*"), F.sum((F.col("d") >= k).cast("long"))
        ).collect()[0]
        # total == 0 is the fully-peeled fixpoint: SUM over zero rows
        # is NULL (kept is None), so `kept == total` alone would miss
        # it and burn the remaining rounds on empty joins (ADVICE r10).
        if total == 0 or kept == total:
            break
        keep = deg.filter(F.col("d") >= k).select("n")
        e = (
            e.join(keep.withColumnRenamed("n", "src"), "src")
            .join(keep.withColumnRenamed("n", "dst"), "dst")
            .localCheckpoint(eager=True)
        )
    return e


def hits(
    edges: DataFrame,
    n_iterations: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999): hub scores for source
    nodes, authority scores for destination nodes, each half-step
    L2-normalized as published. Returns (``id``, ``kind``, ``score``)
    with kind in {'hub', 'authority'} (a node appearing on both sides
    of the edge list gets a row per role). Deterministic up to
    floating-point reassociation in the per-node sums and the global
    L2 norm (~1e-15 per round — same envelope as :func:`pagerank`,
    invisible at the 6-dp rounding every consumer applies).

    Per half-round: ONE shuffle (score × edge join + per-endpoint
    sum) and a 1-row norm aggregate broadcast back — the norm never
    moves data. The raw sum table is eagerly checkpointed per round
    (two consumers: the norm agg and the next join) so the plan stays
    one join deep across rounds — the pagerank lineage discipline."""
    if n_iterations < 1:
        raise ValueError("hits() needs n_iterations >= 1")
    e = (
        edges.filter(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull())
        .select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
        # edge side is fact-sized: hash join without SMJ sorts (the
        # pagerank e_deg measurement applies unchanged)
        .hint("shuffle_hash")
    )
    hubs = e.select(F.col("src").alias("id")).distinct().localCheckpoint(
        eager=True
    )
    # score sides are node-sized; broadcast under the shared gate
    bcast = _fits_broadcast(hubs.count())
    h = hubs.select("id", F.lit(1.0).alias("score"))
    a = None
    for _ in range(n_iterations):
        lhs = F.broadcast(h) if bcast else h
        a_raw = (
            e.join(lhs, e.src == lhs.id)
            .groupBy(e.dst.alias("id"))
            .agg(F.sum("score").alias("s"))
            .localCheckpoint(eager=True)
        )
        na = a_raw.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("nm"))
        a = a_raw.crossJoin(F.broadcast(na)).select(
            "id", (F.col("s") / F.col("nm")).alias("score")
        )
        lhs_a = F.broadcast(a) if bcast else a
        h_raw = (
            e.join(lhs_a, e.dst == lhs_a.id)
            .groupBy(e.src.alias("id"))
            .agg(F.sum("score").alias("s"))
            .localCheckpoint(eager=True)
        )
        nh = h_raw.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("nm"))
        h = h_raw.crossJoin(F.broadcast(nh)).select(
            "id", (F.col("s") / F.col("nm")).alias("score")
        )
    return h.select("id", F.lit("hub").alias("kind"), "score").unionByName(
        a.select("id", F.lit("authority").alias("kind"), "score")
    )


def per_source_bfs(
    edges: DataFrame,
    seeds: DataFrame,
    n_rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "id",
) -> DataFrame:
    """Bounded-round PER-SOURCE BFS over the undirected edge list:
    returns (``source``, ``id``, ``dist``) for every (seed, node) pair
    within ``n_rounds`` hops — the input to sampled-pivot centrality
    estimators (Eppstein–Wang), where the multi-source
    :func:`bfs_distances` would merge the seeds into one min-distance
    and lose the per-source terms. The frontier discipline carries over
    unchanged with a composite (source, id) state: each round joins
    only the new frontier against the edges and anti-joins the visited
    set per source — O(edges × seeds-reaching-them) total, the real
    cost of per-source traversal, paid only within the hop horizon."""
    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .union(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
        .hint("shuffle_hash")
    )
    frontier = seeds.select(
        F.col(seed_col).alias("source"), F.col(seed_col).alias("id")
    ).localCheckpoint(eager=True)
    visited = frontier.select("source", "id", F.lit(0).alias("dist"))
    for rnd in range(1, n_rounds + 1):
        fr = (
            F.broadcast(frontier)
            if _fits_broadcast(frontier.count())
            else frontier
        )
        nxt = (
            sym.join(fr, sym.s == fr.id)
            .select("source", F.col("d").alias("id"))
            .distinct()
            .join(visited, ["source", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        # visited stays a lazy union of already-checkpointed levels —
        # one union deep per round; re-materializing it was one pure
        # scheduling-latency job per round (the betweenness_sampled
        # measurement, same shape).
        visited = visited.unionByName(
            nxt.select("source", "id", F.lit(rnd).alias("dist"))
        )
        frontier = nxt
    return visited


def betweenness_sampled(
    edges: DataFrame,
    seeds: DataFrame,
    n_rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "id",
) -> DataFrame:
    """Sampled-pivot BETWEENNESS centrality (Brandes 2001 restricted
    to a pivot sample and a bounded hop horizon — the standard
    estimator pairing: Brandes–Pich pivots for the O(nm) cost, a
    k-bounded dependency walk for the diameter term). Returns
    (``id``, ``betweenness``): the summed Brandes dependency
    delta_s(v) over the sampled sources, v != s.

    Forward pass: the :func:`per_source_bfs` frontier discipline with
    an ALL-INTEGER shortest-path count riding along — sigma(v) at
    depth r is the exact bigint sum of parent sigmas at depth r-1
    (every shortest path enters through the previous BFS level, so
    the per-level groupBy-sum IS the path count; no floats).
    Backward pass: the dependency recurrence delta(v) = sum over
    successors w of sigma_v/sigma_w * (1 + delta_w), unrolled from
    the deepest level (delta = 0 there) back to depth 1 — one
    edge-join + hash-agg per level, each level eagerly checkpointed
    (the pagerank lineage discipline). The division is the only
    float; the per-node sums follow the q_pagerank round-6 contract.

    Cost per round: ONE (frontier x edges) shuffle-hash join forward,
    one back — O(edges x pivots-reaching-them) inside the horizon,
    never touching the full (source, node) cross space. Node-sized
    sides broadcast under the shared gate."""
    if n_rounds < 1:
        raise ValueError("betweenness_sampled needs n_rounds >= 1")
    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .union(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
        .hint("shuffle_hash")
    )
    f = seeds.select(
        F.col(seed_col).alias("source"),
        F.col(seed_col).alias("id"),
        F.lit(1).cast("bigint").alias("sigma"),
    ).localCheckpoint(eager=True)
    visited = f.select("source", "id")
    levels = [f]  # levels[r] = nodes first reached at depth r, with sigma
    for _ in range(n_rounds):
        fr = F.broadcast(f) if _fits_broadcast(f.count()) else f
        nxt = (
            sym.join(fr, sym.s == fr.id)
            .groupBy("source", F.col("d").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited, ["source", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        # NO checkpoint for the visited set: it is a union of frames
        # that are each already checkpointed (the seed table and every
        # level's nxt), so the lineage stays one union deep per round
        # and re-materializing it bought nothing but a job of
        # scheduling latency per round (measured below on the
        # registered key; the per-level nxt checkpoints — the actual
        # lineage truncation — stay).
        visited = visited.unionByName(nxt.select("source", "id"))
        levels.append(nxt)
        f = nxt
    # Backward dependency accumulation, deepest level first.
    delta = None  # depth-n_rounds nodes: delta = 0
    bc_parts = []
    for r in range(n_rounds, 0, -1):
        hi = levels[r]
        if delta is None:
            hi = hi.select("source", "id", "sigma", F.lit(0.0).alias("delta"))
        else:
            hi = hi.join(delta, ["source", "id"], "left").select(
                "source",
                "id",
                "sigma",
                F.coalesce("delta", F.lit(0.0)).alias("delta"),
            )
        lo = levels[r - 1].select(
            "source", F.col("id").alias("v"), F.col("sigma").alias("sv")
        )
        hi2 = hi.select(
            F.col("source").alias("hsource"),
            F.col("id").alias("w"),
            F.col("sigma").alias("sw"),
            "delta",
        )
        contrib = (
            sym.join(lo, sym.s == lo.v)
            .join(
                hi2,
                (F.col("source") == F.col("hsource"))
                & (F.col("d") == F.col("w")),
            )
            .select(
                "source",
                F.col("v").alias("id"),
                (
                    F.col("sv").cast("double")
                    / F.col("sw")
                    * (F.lit(1.0) + F.col("delta"))
                ).alias("t"),
            )
            .groupBy("source", "id")
            .agg(F.sum("t").alias("delta"))
            .localCheckpoint(eager=True)
        )
        delta = contrib
        if r - 1 >= 1:
            bc_parts.append(contrib)
    if not bc_parts:  # horizon 1: every dependency is zero
        return levels[1].groupBy("id").agg(
            F.round(F.sum(F.lit(0.0)), 6).alias("betweenness")
        )
    out = bc_parts[0]
    for p in bc_parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("id").agg(
        F.round(F.sum("delta"), 6).alias("betweenness")
    )
