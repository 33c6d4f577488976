"""Graph-analytics queries (operators/graph.py) over graphs derived
from the driver star schema. All `ext` — the reference has no graph
code (class.nmea.parser.php:1-399; SURVEY §0).

Graph construction is itself relational: the co-purchase graph is a
self-join of lineitem on the order key, the customer->supplier graph a
join through orders — exactly how production graphs materialize out of
fact tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gps_stream_processing_spark.operators.graph import (
    bfs_distances,
    label_propagation,
    pagerank,
    triangle_count,
)
from gps_stream_processing_spark.plans.registry import register, table

# supplier ids are offset into their own namespace so the bipartite
# customer->supplier graph has disjoint node ids
_SUPP_OFFSET = 1_000_000_000


def copurchase_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Parts that appear in the same order, as distinct undirected
    (a < b) edges."""
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    return (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )


def landed_copurchase_edges(spark: SparkSession, sf: str) -> DataFrame:
    """:func:`copurchase_edges` materialized once per sf dir — same
    rationale and staging discipline as
    :func:`landed_customer_supplier_edges`; the lineitem self-join
    derivation is the most expensive edge build in the suite."""
    return _landed_edges(
        spark, sf, "copurchase", ("lineitem",), lambda: copurchase_edges(spark, sf)
    )


def _landed_edges(spark, sf, kind, sources, build):
    import glob as _glob
    import os

    from gps_stream_processing_spark.workdir import land_dir

    parts = []
    for name in sources:
        st = os.stat(os.path.join(sf, f"{name}.parquet"))
        parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
    fp = ";".join(parts) + f";offset:{_SUPP_OFFSET}"
    out = os.path.join(land_dir("graph_edges", sf), kind)
    fp_file = os.path.join(out, "_SOURCE_FINGERPRINT")
    try:
        fp_disk, n_files = open(fp_file).read().split("\n")
        staged = fp_disk == fp and (
            len(_glob.glob(os.path.join(out, "part-*"))) == int(n_files)
        )
    except (OSError, ValueError):
        staged = False
    if not staged:
        # 8 files: multi-map parquet so downstream shuffles (and AQE
        # skew splits, if a hub node ever dominates) can split reads
        build().repartition(8).write.mode("overwrite").parquet(out)
        n = len(_glob.glob(os.path.join(out, "part-*")))
        tmp = fp_file + ".tmp"
        with open(tmp, "w") as f:  # atomic: no partial fingerprint
            f.write(f"{fp}\n{n}")
        os.replace(tmp, fp_file)
    return spark.read.parquet(out)


def customer_supplier_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Directed customer -> supplier edges through orders/lineitem."""
    o = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )


def weighted_customer_supplier_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted customer->supplier edges: w = lineitem count between
    the pair (interaction intensity as an all-integer edge cost —
    exact on both engines, unlike float affinities)."""
    o = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .agg(F.count("*").cast("bigint").alias("w"))
    )


def landed_weighted_cs_edges(spark: SparkSession, sf: str) -> DataFrame:
    """:func:`weighted_customer_supplier_edges` materialized once per
    sf dir — the same landed-graph posture as the unweighted list."""
    return _landed_edges(
        spark,
        sf,
        "cust_supp_w",
        ("orders", "lineitem"),
        lambda: weighted_customer_supplier_edges(spark, sf),
    )


def landed_customer_supplier_edges(spark: SparkSession, sf: str) -> DataFrame:
    """:func:`customer_supplier_edges` materialized once per sf dir and
    re-read from parquet — the production posture for iterative graph
    consumers: a graph pipeline derives its edge list ONCE and every
    algorithm (pagerank, LPA, BFS) scans the materialized table,
    instead of re-paying the fact-fact derivation join per query
    (profiled at ~1.1s of q_bfs_distance's ~2.6s at sf0.1 — the single
    largest phase; adopting it for pagerank/LPA measured 6.26→4.85s
    and 2.31→1.97s warm medians). Fingerprint-gated like the
    bucketed/CBO landings: source path+size+mtime of the inputs plus
    the landed file count, so a regenerated fixture or a
    partially-deleted landing re-lands instead of serving
    stale/incomplete edges."""
    return _landed_edges(
        spark,
        sf,
        "cust_supp",
        ("orders", "lineitem"),
        lambda: customer_supplier_edges(spark, sf),
    )


@register(
    "q_triangle_count",
    oracle="""
    WITH e AS (
      SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS a,
                      GREATEST(a.l_partkey, b.l_partkey) AS b
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e1.b = e2.a
    WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.a = e1.a AND e3.b = e2.b)
    """,
    doc="Triangle count on the co-purchase graph (parts sharing an "
    "order), node-ordered a<b<c formulation (operators/graph.py): "
    "greater-neighbor adjacency arrays + one edge-keyed join, closing "
    "edges checked via JVM array_intersect — each triangle counted "
    "exactly once, no wedge materialization. Exact integer result, "
    "full oracle (the oracle keeps the equivalent wedge-join SQL).",
)
def q_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    e = landed_copurchase_edges(spark, sf)
    return triangle_count(e, stats=_copurchase_degree_stats(spark, sf, e))


def _copurchase_degree_stats(spark, sf, edges) -> tuple[int, int]:
    """The triangle skew-gate statistic (max_deg, m) for the landed
    co-purchase graph, persisted beside the landed files and keyed by
    the landing fingerprint — so only the FIRST run after a (re)land
    pays the blocking degree job (VERDICT r12 item 6; measured ~0.5 s
    per call at sf0.1). Falls back to computing without persisting if
    the fingerprint is unreadable (fresh land mid-flight)."""
    import os

    from gps_stream_processing_spark.operators.graph import degree_stats
    from gps_stream_processing_spark.workdir import land_dir

    out = os.path.join(land_dir("graph_edges", sf), "copurchase")
    fp_file = os.path.join(out, "_SOURCE_FINGERPRINT")
    stats_file = os.path.join(out, "_DEGREE_STATS")
    try:
        fp = open(fp_file).read()
    except OSError:
        return degree_stats(edges)
    try:
        fp_disk, max_deg, m = open(stats_file).read().split("\n")
        if fp_disk == fp.replace("\n", "\\n"):
            return int(max_deg), int(m)
    except (OSError, ValueError):
        pass
    st = degree_stats(edges)
    tmp = stats_file + ".tmp"
    with open(tmp, "w") as f:  # atomic: no partial stats row
        f.write(f"{fp.replace(chr(10), chr(92) + 'n')}\n{st[0]}\n{st[1]}")
    os.replace(tmp, stats_file)
    return st


def _pagerank_oracle(n_iterations: int = 10, damping: float = 0.85) -> str:
    """Full DuckDB oracle for fixed-iteration PageRank: the 10 rounds
    unrolled as chained CTEs (DuckDB's recursive CTE can't reference the
    working table twice per step — once for contributions, once for the
    dangling-mass total — so unrolling is the honest expression).

    Every per-iteration CTE is ``AS MATERIALIZED``: each ``c{i}`` has two
    consumers (the rank join and the dangling-mass sum), so DuckDB's
    default CTE *inlining* would double the expansion per round — a
    2^10 blow-up of the edge-derivation subtree. Same reasoning as the
    engine's per-round ``localCheckpoint`` (operators/graph.py).

    Float discipline: all constants forced to DOUBLE (a bare ``0.85``
    parses as DECIMAL and (1 - 0.85) would be exact where IEEE isn't),
    both sides round to 6 dp — per-destination sum reassociation is
    ~1e-15 relative, invisible at 1e-6 spacing. Verified hash-exact vs
    the engine at sf0.001 and sf0.01."""
    d = f"CAST({damping} AS DOUBLE)"
    sql = [f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS src, l_suppkey + {_SUPP_OFFSET} AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
    nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
    ed AS MATERIALIZED (SELECT e.src, e.dst, deg.deg FROM e JOIN deg USING (src)),
    r0 AS MATERIALIZED (SELECT id, 1.0 / nn.n AS rank FROM nodes, nn)"""]
    for i in range(1, n_iterations + 1):
        sql.append(f""",
    c{i} AS MATERIALIZED (
      SELECT ed.dst AS id, SUM(r.rank / ed.deg) AS s
      FROM r{i - 1} r JOIN ed ON r.id = ed.src
      GROUP BY ed.dst
    ),
    d{i} AS MATERIALIZED (SELECT 1.0 - COALESCE(SUM(s), 0.0) AS dm FROM c{i}),
    r{i} AS MATERIALIZED (
      SELECT nodes.id,
             (1.0 - {d}) / nn.n + {d} * (COALESCE(c{i}.s, 0.0) + d{i}.dm / nn.n) AS rank
      FROM nodes CROSS JOIN nn CROSS JOIN d{i}
      LEFT JOIN c{i} ON nodes.id = c{i}.id
    )""")
    sql.append(f"""
    SELECT id, ROUND(rank, 6) AS rank FROM r{n_iterations}""")
    return "".join(sql)


@register(
    "q_pagerank",
    oracle=_pagerank_oracle(),
    doc="PageRank (10 iterations, damping 0.85) over the bipartite "
    "customer->supplier purchase graph — per round one rank x edge "
    "join + one per-destination sum, lineage checkpoint-truncated "
    "(operators/graph.py). Full oracle: the same iteration unrolled "
    "as materialized DuckDB CTEs, both sides rounded to 6 dp; pytest "
    "additionally pins the operator against an exact driver-side "
    "replica at 1e-9.",
)
def q_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    ranks = pagerank(landed_customer_supplier_edges(spark, sf), n_iterations=10)
    return ranks.select("id", F.round("rank", 6).alias("rank"))


def _lpa_oracle(n_iterations: int = 3) -> str:
    """Full DuckDB oracle for fixed-iteration label propagation on the
    customer->supplier purchase graph: the rounds unrolled as chained
    MATERIALIZED CTEs (the _pagerank_oracle pattern — each l{i} feeds
    the next round's join, and default CTE inlining would re-expand the
    edge derivation per round). All-integer counts and ids; argmax
    expressed as ROW_NUMBER ... ORDER BY c DESC, lbl — identical to the
    engine's struct-min (-count, label) tie-break. Exact, no float
    risk. (Graph choice: the bipartite purchase graph, ~0.6M edges at
    bench SF vs the co-purchase graph's ~1.2M — measured 3.2s vs 4.6s
    for the 3-round loop, same community semantics: market segments of
    customers and the suppliers they share.)"""
    sql = [f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS a, l_suppkey + {_SUPP_OFFSET} AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    sym AS MATERIALIZED (
      SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e
    ),
    l0 AS MATERIALIZED (SELECT DISTINCT s AS id, s AS lbl FROM sym)"""]
    for i in range(1, n_iterations + 1):
        sql.append(f""",
    c{i} AS (
      SELECT sym.s AS id, l.lbl AS lbl, COUNT(*) AS c
      FROM sym JOIN l{i - 1} l ON sym.d = l.id
      GROUP BY 1, 2
    ),
    l{i} AS MATERIALIZED (
      SELECT id, lbl FROM (
        SELECT id, lbl,
               ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
        FROM c{i}
      ) t WHERE rn = 1
    )""")
    sql.append(f"""
    SELECT id, lbl AS label FROM l{n_iterations}""")
    return "".join(sql)


@register(
    "q_label_propagation",
    oracle=_lpa_oracle(),
    doc="Label-propagation communities (3 synchronous rounds, "
    "most-frequent-neighbor-label with smallest-label tie-break) over "
    "the bipartite customer->supplier purchase graph — per round one "
    "edge x labels join + two hash aggregations, per-round "
    "checkpointed (operators/graph.py). Deterministic by construction "
    "(integer counts, total tie order), so the full oracle is the same "
    "iteration unrolled as materialized DuckDB CTEs. The frequency "
    "vote keeps dense clusters as distinct communities where connected "
    "components would flood one label per component.",
)
def q_label_propagation(spark: SparkSession, sf: str) -> DataFrame:
    return label_propagation(landed_customer_supplier_edges(spark, sf), n_iterations=3)


def _bfs_oracle(n_rounds: int = 3) -> str:
    """Full DuckDB oracle for the capped multi-source BFS: rounds
    unrolled as chained MATERIALIZED CTEs (the _pagerank_oracle
    pattern). All-integer — exact. Frontier f{i} = nodes first seen in
    round i; d{i} = everything seen so far; NOT EXISTS is the anti-join
    the engine expresses with a left_anti."""
    sql = [f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS a, l_suppkey + {_SUPP_OFFSET} AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    sym AS MATERIALIZED (
      SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT s AS id FROM sym),
    f0 AS MATERIALIZED (
      SELECT DISTINCT c_custkey AS id FROM customer
      WHERE c_nationkey = 0
        AND EXISTS (SELECT 1 FROM nodes n WHERE n.id = c_custkey)
    ),
    d0 AS MATERIALIZED (SELECT id, 0 AS dist FROM f0)"""]
    for i in range(1, n_rounds + 1):
        sql.append(f""",
    f{i} AS MATERIALIZED (
      SELECT DISTINCT sym.d AS id
      FROM sym JOIN f{i - 1} f ON sym.s = f.id
      WHERE NOT EXISTS (SELECT 1 FROM d{i - 1} v WHERE v.id = sym.d)
    ),
    d{i} AS MATERIALIZED (
      SELECT id, dist FROM d{i - 1}
      UNION ALL SELECT id, {i} AS dist FROM f{i}
    )""")
    sql.append(f"""
    SELECT id, CAST(dist AS INT) AS dist FROM d{n_rounds}""")
    return "".join(sql)


@register(
    "q_bfs_distance",
    oracle=_bfs_oracle(),
    doc="Capped multi-source BFS (3 hops) over the undirected "
    "customer<->supplier purchase graph, seeded by nation-0 customers "
    "— the bounded-radius neighborhood query (blast-radius / "
    "influence-set analysis). FRONTIER-based (operators/graph.py "
    "bfs_distances): each round joins only the newly-discovered "
    "frontier against the edges and anti-joins the visited set, so "
    "total work is O(m) across the whole run, not O(m x rounds); the "
    "node-sized frontier rides the same size-gated broadcast as "
    "pagerank's ranks. All-integer hop distances, deterministic by "
    "construction -> full oracle with the rounds unrolled as "
    "materialized DuckDB CTEs.",
)
def q_bfs_distance(spark: SparkSession, sf: str) -> DataFrame:
    seeds = (
        table(spark, sf, "customer")
        .filter(F.col("c_nationkey") == 0)
        .select(F.col("c_custkey").alias("id"))
    )
    # landed edge list: the derivation join is paid once per sf dir
    # (landed_customer_supplier_edges), the steady-state query scans the
    # materialized graph - profiled ~1.1s/call saved at sf0.1
    out = bfs_distances(landed_customer_supplier_edges(spark, sf), seeds, n_rounds=3)
    return out.select("id", F.col("dist").cast("int").alias("dist"))


@register(
    "q_degree_distribution",
    # The landed co-purchase edge list is undirected half-matrix (a<b):
    # a node's degree counts BOTH endpoint roles. Histogram over
    # degrees (node-count per degree value) — the standard first look
    # at any graph's shape (hub detection, power-law check).
    oracle="""
    WITH e AS (
      SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS a,
                      GREATEST(a.l_partkey, b.l_partkey) AS b
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    ), deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
      GROUP BY node
    )
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree
    """,
    doc="Degree distribution of the co-purchase graph (SURVEY §2.7b "
    "ext): explode both endpoints of the landed half-matrix edge list, "
    "count per node, histogram per degree — two hash-aggs over the "
    "materialized graph, the profiling pass that decides every "
    "downstream graph strategy (a power-law tail means salting/hub "
    "orientation; see q_triangle_count's measured skew gate). At "
    "100 TB the edge list never re-derives (landed once per sf) and "
    "degrees shuffle 8-byte keys.",
)
def q_degree_distribution(spark: SparkSession, sf: str) -> DataFrame:
    e = landed_copurchase_edges(spark, sf)
    deg = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))


def _kcore_oracle(k: int = 2, rounds: int = 6) -> str:
    """Unrolled k-core peeling SQL: the same fixed-round computation
    the engine runs (the pagerank/LPA unroll discipline) — each round
    a degree HAVING filter plus an edge restriction."""
    parts = [
        """
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS a,
                      GREATEST(a.l_partkey, b.l_partkey) AS b
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    )"""
    ]
    # Every CTE is MATERIALIZED: each round references its predecessor
    # three times, so inlined CTEs would re-expand the base self-join
    # 3^rounds times (observed as a "Too many open files" blow-up).
    for i in range(1, rounds + 1):
        parts.append(
            f"""
    , d{i} AS MATERIALIZED (
      SELECT n FROM (
        SELECT a AS n FROM e{i - 1} UNION ALL SELECT b AS n FROM e{i - 1}
      ) GROUP BY n HAVING COUNT(*) >= {k}
    ), e{i} AS MATERIALIZED (
      SELECT e.a, e.b FROM e{i - 1} e
      JOIN d{i} x ON x.n = e.a
      JOIN d{i} y ON y.n = e.b
    )"""
        )
    parts.append(
        f"""
    SELECT n AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM (SELECT a AS n FROM e{rounds}
          UNION ALL SELECT b AS n FROM e{rounds})
    GROUP BY n
    """
    )
    return "".join(parts)


@register(
    "q_kcore",
    oracle=_kcore_oracle(k=2, rounds=6),
    doc="2-core of the co-purchase graph (SURVEY §2.7b ext, completing "
    "the classic graph-mining set beside triangles/PageRank/LPA/BFS/"
    "components): iterative peeling — drop degree<2 nodes, restrict "
    "edges, repeat — over a FIXED 6-round budget, returning each "
    "surviving node with its in-core degree. The k-core is the "
    "standard dense-substructure filter (spam/community cores, graph "
    "sparsification before expensive algorithms); peeling converges "
    "within the budget on these fixtures (pytest-pinned round-5 == "
    "round-6), and the fixed-round contract is what makes the full "
    "DuckDB oracle possible (operators/graph.py kcore_edges; same "
    "per-round localCheckpoint discipline as pagerank).",
)
def q_kcore(spark: SparkSession, sf: str) -> DataFrame:
    from gps_stream_processing_spark.operators.graph import kcore_edges

    e = kcore_edges(landed_copurchase_edges(spark, sf), k=2, rounds=6)
    return (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("core_degree"))
    )


def _sssp_oracle(n_rounds: int = 4) -> str:
    """Full DuckDB oracle for the bounded-round Bellman-Ford SSSP:
    rounds unrolled as chained MATERIALIZED CTEs (the _bfs_oracle
    pattern — every CTE has 2+ consumers, so inlining would re-expand
    the derivation join exponentially). All-integer weights and path
    sums — exact; MIN is traversal-order-independent. f{i} = nodes
    whose distance improved in round i (the frontier the engine
    relaxes next round); d{i} = the settled table after round i."""
    sql = [f"""
    WITH e AS MATERIALIZED (
      SELECT o_custkey AS a, l_suppkey + {_SUPP_OFFSET} AS b,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    sym AS MATERIALIZED (
      SELECT a AS s, b AS d, w FROM e UNION ALL SELECT b, a, w FROM e
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT s AS id FROM sym),
    f0 AS MATERIALIZED (
      SELECT DISTINCT c_custkey AS id, CAST(0 AS BIGINT) AS dist
      FROM customer
      WHERE c_nationkey = 0
        AND EXISTS (SELECT 1 FROM nodes n WHERE n.id = c_custkey)
    ),
    d0 AS MATERIALIZED (SELECT id, dist FROM f0)"""]
    for i in range(1, n_rounds + 1):
        sql.append(f""",
    r{i} AS (
      SELECT sym.d AS id, MIN(f.dist + sym.w) AS nd
      FROM sym JOIN f{i - 1} f ON sym.s = f.id
      GROUP BY 1
    ),
    f{i} AS MATERIALIZED (
      SELECT r.id, r.nd AS dist
      FROM r{i} r LEFT JOIN d{i - 1} d ON d.id = r.id
      WHERE d.id IS NULL OR r.nd < d.dist
    ),
    d{i} AS MATERIALIZED (
      SELECT d.id, d.dist FROM d{i - 1} d
      WHERE NOT EXISTS (SELECT 1 FROM f{i} f WHERE f.id = d.id)
      UNION ALL SELECT id, dist FROM f{i}
    )""")
    sql.append(f"""
    SELECT id, dist FROM d{n_rounds}""")
    return "".join(sql)


@register(
    "q_sssp",
    oracle=_sssp_oracle(),
    doc="Multi-source WEIGHTED shortest paths (SURVEY §2.7b ext — the "
    "remaining classic beside triangle/PageRank/LPA/BFS/k-core): "
    "bounded-round Bellman-Ford over the weighted customer<->supplier "
    "graph (edge cost = lineitem count between the pair, all-integer), "
    "seeded by nation-0 customers, 4 relaxation rounds. FRONTIER "
    "relaxation (operators/graph.py sssp_distances): each round "
    "relaxes only edges leaving nodes whose distance improved last "
    "round, min-merges into the settled table, early-exits at the "
    "fixpoint — O(edges touching the frontier) per round, never "
    "O(m x rounds); the node-sized frontier rides the measured "
    "broadcast gate, per-round localCheckpoint truncates lineage. "
    "Exact integer path sums -> full oracle with the rounds unrolled "
    "as materialized DuckDB CTEs.",
)
def q_sssp(spark: SparkSession, sf: str) -> DataFrame:
    from gps_stream_processing_spark.operators.graph import sssp_distances

    seeds = (
        table(spark, sf, "customer")
        .filter(F.col("c_nationkey") == 0)
        .select(F.col("c_custkey").alias("id"))
    )
    return sssp_distances(
        landed_weighted_cs_edges(spark, sf), seeds, n_rounds=4
    )


def _hits_oracle(n_iterations: int = 8) -> str:
    """Full DuckDB oracle for fixed-iteration HITS: rounds unrolled as
    chained MATERIALIZED CTEs (the _pagerank_oracle pattern — each raw
    sum table has two consumers, the L2 norm and the next join, so
    inlining would double the expansion per half-round). Float
    discipline identical to pagerank: per-endpoint sum + one global
    L2 norm per half-round, ~1e-15 reassociation, both sides rounded
    6 dp at the very end only."""
    sql = [f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS src, l_suppkey + {_SUPP_OFFSET} AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    h0 AS MATERIALIZED (
      SELECT DISTINCT src AS id, 1.0 AS score FROM e
    )"""]
    for i in range(1, n_iterations + 1):
        sql.append(f""",
    ar{i} AS MATERIALIZED (
      SELECT e.dst AS id, SUM(h.score) AS s
      FROM e JOIN h{i - 1} h ON e.src = h.id
      GROUP BY e.dst
    ),
    an{i} AS MATERIALIZED (SELECT sqrt(SUM(s * s)) AS nm FROM ar{i}),
    a{i} AS MATERIALIZED (
      SELECT id, s / nm AS score FROM ar{i} CROSS JOIN an{i}
    ),
    hr{i} AS MATERIALIZED (
      SELECT e.src AS id, SUM(a.score) AS s
      FROM e JOIN a{i} a ON e.dst = a.id
      GROUP BY e.src
    ),
    hn{i} AS MATERIALIZED (SELECT sqrt(SUM(s * s)) AS nm FROM hr{i}),
    h{i} AS MATERIALIZED (
      SELECT id, s / nm AS score FROM hr{i} CROSS JOIN hn{i}
    )""")
    sql.append(f"""
    SELECT id, 'hub' AS kind, ROUND(score, 6) AS score FROM h{n_iterations}
    UNION ALL
    SELECT id, 'authority' AS kind, ROUND(score, 6) AS score
    FROM a{n_iterations}""")
    return "".join(sql)


@register(
    "q_hits",
    oracle=_hits_oracle(),
    doc="HITS hubs & authorities (Kleinberg 1999; 8 iterations, "
    "L2-normalized half-steps as published) over the bipartite "
    "customer->supplier purchase graph — the link-analysis companion "
    "of q_pagerank: hub customers spread purchases across many "
    "authoritative suppliers, authority suppliers are bought from by "
    "strong hubs. Per half-round ONE score×edge shuffle plus a 1-row "
    "L2-norm broadcast (operators/graph.py hits — pagerank's "
    "checkpoint-per-round lineage discipline and node-sized broadcast "
    "gate). Full oracle: the same iteration unrolled as materialized "
    "DuckDB CTEs, both sides rounded 6 dp.",
)
def q_hits(spark: SparkSession, sf: str) -> DataFrame:
    from gps_stream_processing_spark.operators.graph import hits

    scores = hits(landed_customer_supplier_edges(spark, sf), n_iterations=8)
    return scores.select("id", "kind", F.round("score", 6).alias("score"))


def _harmonic_oracle(n_rounds: int = 3) -> str:
    """Full DuckDB oracle for sampled-pivot harmonic centrality: the
    per-source BFS unrolled as materialized CTEs over (source, id)
    pairs (the _bfs_oracle pattern with a composite state), then the
    ALL-INTEGER 6×harmonic fold 6·c₁ + 3·c₂ + 2·c₃ — exact, so the
    sampled estimator gets a full value-hash check."""
    sql = [f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS a, l_suppkey + {_SUPP_OFFSET} AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    sym AS MATERIALIZED (
      SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT s AS id FROM sym),
    f0 AS MATERIALIZED (
      SELECT DISTINCT c_custkey AS source, c_custkey AS id
      FROM customer
      WHERE c_custkey % 997 = 1
        AND EXISTS (SELECT 1 FROM nodes n WHERE n.id = c_custkey)
    ),
    d0 AS MATERIALIZED (SELECT source, id, 0 AS dist FROM f0)"""]
    for i in range(1, n_rounds + 1):
        sql.append(f""",
    f{i} AS MATERIALIZED (
      SELECT DISTINCT f.source, sym.d AS id
      FROM sym JOIN f{i - 1} f ON sym.s = f.id
      WHERE NOT EXISTS (SELECT 1 FROM d{i - 1} v
                        WHERE v.source = f.source AND v.id = sym.d)
    ),
    d{i} AS MATERIALIZED (
      SELECT source, id, dist FROM d{i - 1}
      UNION ALL SELECT source, id, {i} AS dist FROM f{i}
    )""")
    sql.append(f"""
    SELECT id,
           CAST(COUNT(*) AS BIGINT) AS n_seeds_reached,
           CAST(SUM(CASE dist WHEN 1 THEN 6 WHEN 2 THEN 3
                              WHEN 3 THEN 2 ELSE 0 END) AS BIGINT)
             AS harmonic_x6
    FROM d{n_rounds} WHERE dist > 0 GROUP BY id""")
    return "".join(sql)


@register(
    "q_harmonic_centrality",
    oracle=_harmonic_oracle(),
    doc="Sampled-pivot HARMONIC centrality (SURVEY §2.7b ext — the "
    "Eppstein–Wang estimator family: closeness/harmonic from a "
    "sampled seed set instead of all-pairs BFS, the only way "
    "centrality scales past toy graphs; harmonic Σ 1/d handles "
    "unreachable nodes natively where closeness diverges): per-"
    "source BFS from the ~0.1% customer pivot sample within a "
    "3-hop horizon (operators/graph.py per_source_bfs — the frontier "
    "discipline with composite (source, id) state), then the "
    "ALL-INTEGER fold 6·c₁+3·c₂+2·c₃ per node (×6 clears the "
    "1/1, 1/2, 1/3 denominators — exact on any engine). Full "
    "oracle with the rounds unrolled as materialized DuckDB CTEs.",
)
def q_harmonic_centrality(spark: SparkSession, sf: str) -> DataFrame:
    from gps_stream_processing_spark.operators.graph import per_source_bfs

    seeds = (
        table(spark, sf, "customer")
        .filter(F.col("c_custkey") % 997 == 1)
        .select(F.col("c_custkey").alias("id"))
    )
    vis = per_source_bfs(
        landed_customer_supplier_edges(spark, sf), seeds, n_rounds=3
    )
    return (
        vis.filter(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_seeds_reached"),
            F.sum(
                F.when(F.col("dist") == 1, 6)
                .when(F.col("dist") == 2, 3)
                .when(F.col("dist") == 3, 2)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("harmonic_x6"),
        )
    )


def _betweenness_oracle(n_rounds: int = 3) -> str:
    """Full DuckDB oracle for sampled-pivot bounded-horizon Brandes
    betweenness on the customer->supplier purchase graph: forward BFS
    levels with ALL-INTEGER path counts (each level's sigma is the
    grouped sum of parent sigmas — exact), then the dependency
    recurrence unrolled from the deepest level back, as materialized
    CTEs (the _pagerank_oracle/_lpa_oracle pattern). The sigma
    division is the only float; both sides round to 6 dp per the
    q_pagerank float contract."""
    sql = [f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS a, l_suppkey + {_SUPP_OFFSET} AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    sym AS MATERIALIZED (
      SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e
    ),
    f0 AS MATERIALIZED (
      SELECT c_custkey AS source, c_custkey AS id, CAST(1 AS BIGINT) AS sigma
      FROM customer WHERE c_custkey % 997 = 1
    )"""]
    seen = ["f0"]
    for r in range(1, n_rounds + 1):
        anti = " UNION ALL ".join(
            f"SELECT source, id FROM {lv}" for lv in seen
        )
        sql.append(f""",
    f{r} AS MATERIALIZED (
      SELECT t.source, t.id, t.sigma FROM (
        SELECT p.source, sym.d AS id, CAST(SUM(p.sigma) AS BIGINT) AS sigma
        FROM sym JOIN f{r - 1} p ON sym.s = p.id
        GROUP BY 1, 2
      ) t
      WHERE NOT EXISTS (
        SELECT 1 FROM ({anti}) v
        WHERE v.source = t.source AND v.id = t.id)
    )""")
        seen.append(f"f{r}")
    # backward: c{r} = delta of the depth-r nodes; deepest level has 0
    for r in range(n_rounds - 1, 0, -1):
        dexpr = (
            "0.0"
            if r + 1 == n_rounds
            else f"COALESCE(c{r + 1}.delta, 0.0)"
        )
        djoin = (
            ""
            if r + 1 == n_rounds
            else f"\n      LEFT JOIN c{r + 1} ON c{r + 1}.source = hi.source"
            f" AND c{r + 1}.id = hi.id"
        )
        sql.append(f""",
    c{r} AS MATERIALIZED (
      SELECT lo.source, lo.id,
             SUM(CAST(lo.sigma AS DOUBLE) / hi.sigma * (1.0 + {dexpr}))
               AS delta
      FROM f{r} lo JOIN sym ON sym.s = lo.id
      JOIN f{r + 1} hi ON hi.source = lo.source AND hi.id = sym.d{djoin}
      GROUP BY 1, 2
    )""")
    parts = " UNION ALL ".join(
        f"SELECT id, delta FROM c{r}" for r in range(1, n_rounds)
    )
    sql.append(f"""
    SELECT id, ROUND(SUM(delta), 6) AS betweenness
    FROM ({parts}) GROUP BY id
    """)
    return "".join(sql)


@register(
    "q_betweenness_sampled",
    oracle=_betweenness_oracle(3),
    doc="Sampled-pivot bounded-horizon BETWEENNESS centrality "
    "(SURVEY §2.7b ext — the standard 'who sits on the shortest "
    "paths' ranking the graph tier lacked beside "
    "pagerank/HITS/harmonic): Brandes dependency accumulation on the "
    "reverse BFS DAG of the ~0.1% customer pivot slice "
    "(q_harmonic_centrality's sample), 3-hop horizon. Forward pass "
    "rides the per_source_bfs frontier discipline with exact bigint "
    "shortest-path counts (sigma sums over the previous level); "
    "backward pass unrolls delta(v) = sum sigma_v/sigma_w (1 + "
    "delta_w) one edge-join per level (operators/graph.py "
    "betweenness_sampled). Full oracle: the same levels + recurrence "
    "as materialized DuckDB CTEs, rounded 6 dp per the q_pagerank "
    "float contract; pytest pins rank agreement against exact "
    "all-pairs Brandes at sf0.001. At 100 TB the pivot count is the "
    "cost dial (Brandes-Pich), state is O(nodes x pivots-reaching) "
    "inside the horizon, never all-pairs.",
)
def q_betweenness_sampled(spark: SparkSession, sf: str) -> DataFrame:
    from gps_stream_processing_spark.operators.graph import (
        betweenness_sampled,
    )

    seeds = (
        table(spark, sf, "customer")
        .filter(F.col("c_custkey") % 997 == 1)
        .select(F.col("c_custkey").alias("id"))
    )
    return betweenness_sampled(
        landed_customer_supplier_edges(spark, sf), seeds, n_rounds=3
    )


@register(
    "q_link_common_neighbors",
    # Per-entity common-neighbor link prediction: for each of the 20
    # highest-degree parts (ties by id), the best NON-adjacent partner
    # by shared-neighbor count (ties by partner id). All counts exact
    # integers; (degree DESC, id) and (cnt DESC, z) are unique total
    # orders, so the 20 output rows are fully deterministic.
    oracle="""
    WITH e AS (
      SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS a,
                      GREATEST(a.l_partkey, b.l_partkey) AS b
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    ), sym AS (
      SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e
    ), q AS (
      SELECT s AS qid, CAST(COUNT(*) AS BIGINT) AS degree
      FROM sym GROUP BY s ORDER BY COUNT(*) DESC, s LIMIT 20
    ), w AS (
      SELECT q.qid, q.degree, s2.d AS z
      FROM q JOIN sym s1 ON s1.s = q.qid
             JOIN sym s2 ON s2.s = s1.d
      WHERE s2.d <> q.qid
    ), cn AS (
      SELECT qid, degree, z, CAST(COUNT(*) AS BIGINT) AS c
      FROM w GROUP BY 1, 2, 3
    ), open_pairs AS (
      SELECT * FROM cn
      WHERE NOT EXISTS (
        SELECT 1 FROM e
        WHERE e.a = LEAST(cn.qid, cn.z) AND e.b = GREATEST(cn.qid, cn.z))
    ), best AS (
      SELECT qid, degree, z, c,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, z) AS rn
      FROM open_pairs
    )
    SELECT qid AS part, degree, z AS predicted,
           c AS common_neighbors
    FROM best WHERE rn = 1 ORDER BY part
    """,
    doc="Per-entity common-neighbor LINK PREDICTION (SURVEY §2.7b "
    "ext — the 'which edge is missing' primitive behind "
    "recommendation/graph-completion: for each query part, the "
    "non-co-purchased part sharing the most co-purchase partners is "
    "the likeliest next edge). Query set = the 20 highest-degree "
    "parts; per query the two-hop expansion costs O(deg²) — the "
    "per-entity recommendation shape that scales to 100 TB, unlike "
    "the all-pairs A² wedge count (measured 148M wedge units on "
    "this near-regular avg-deg-120 graph at sf0.1 — 80 s of pure "
    "wedge shuffle; the per-query form is ~300k units, sub-second). "
    "Two hash-join hops from the query set + one hash-agg + an "
    "anti-join against the edge list + a per-query min_by argmax.",
)
def q_link_common_neighbors(spark: SparkSession, sf: str) -> DataFrame:
    e = landed_copurchase_edges(spark, sf)
    sym = e.select(F.col("src").alias("s"), F.col("dst").alias("d")).unionByName(
        e.select(F.col("dst").alias("s"), F.col("src").alias("d"))
    ).localCheckpoint(eager=True)
    q = (
        sym.groupBy(F.col("s").alias("qid"))
        .agg(F.count("*").cast("bigint").alias("degree"))
        .orderBy(F.desc("degree"), "qid")
        .limit(20)
    )
    s1 = sym.select(F.col("s").alias("qid"), F.col("d").alias("v"))
    s2 = sym.select(F.col("s").alias("v"), F.col("d").alias("z"))
    cn = (
        F.broadcast(q)
        .join(s1, "qid")
        .join(s2, "v")
        .filter(F.col("z") != F.col("qid"))
        .groupBy("qid", "degree", "z")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    open_pairs = cn.join(
        e,
        (F.least("qid", "z") == e.src) & (F.greatest("qid", "z") == e.dst),
        "left_anti",
    )
    best = open_pairs.groupBy("qid", "degree").agg(
        F.min_by(F.struct("z", "c"), F.struct(-F.col("c"), F.col("z"))).alias(
            "b"
        )
    )
    return best.orderBy("qid").select(
        F.col("qid").alias("part"),
        "degree",
        F.col("b.z").alias("predicted"),
        F.col("b.c").alias("common_neighbors"),
    )
