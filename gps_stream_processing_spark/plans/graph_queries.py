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

from gps_stream_processing_spark.operators.graph import pagerank, triangle_count
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
    "order), node-ordered a<b<c formulation (operators/graph.py): two "
    "shuffle joins + a semi-join close check — each triangle counted "
    "exactly once, degree skew left to AQE. Exact integer result, full "
    "oracle.",
)
def q_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    return triangle_count(copurchase_edges(spark, sf))


@register(
    "q_pagerank",
    # No SQL oracle: fixed-iteration PageRank needs recursion DuckDB's
    # recursive CTE can't express cleanly (the recursive term would have
    # to reference the working table twice: once for contributions, once
    # for dangling mass). Correctness is pinned instead by pytest
    # (tests/test_graph.py): the distributed result must match an exact
    # driver-side replica of the same iteration at 1e-9, and ranks must
    # sum to 1.
    doc="PageRank (10 iterations, damping 0.85) over the bipartite "
    "customer->supplier purchase graph — per round one rank x edge "
    "join + one per-destination sum, lineage checkpoint-truncated "
    "(operators/graph.py). Rows-only driver check; pytest pins values.",
)
def q_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    ranks = pagerank(customer_supplier_edges(spark, sf), n_iterations=10)
    return ranks.select("id", F.round("rank", 9).alias("rank"))
