"""Interleaved A/B timing behind the triangle-count rewrite (round 5):
the r1-r4 wedge-join formulation (kept HERE as the measurable baseline
— it no longer exists in operators/graph.py) vs the shipped
adjacency-intersect `triangle_count`. Scratch tool, not a test.

Recorded result at sf0.1, medians of 5 interleaved trials:
wedge 4.8s vs adjacency 3.1s (SCALE.md 'Measured scaling' notes)."""

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gps_stream_processing_spark.operators.graph import triangle_count
from gps_stream_processing_spark.plans.graph_queries import copurchase_edges
from gps_stream_processing_spark.plans.registry import tune_session

SF = "/root/testdata/sf0.1"


def triangle_count_wedge(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """The r1-r4 node-ordered 3-way wedge self-join, verbatim: two
    shuffle joins + a semi-join close check."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
        .hint("shuffle_hash")
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x3"), F.col("b").alias("z3"))
    return (
        e1.join(e2, e1.y == e2.y2)
        .join(
            e3,
            (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")),
            "left_semi",
        )
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    tune_session(spark, SF)
    edges_fn = lambda: copurchase_edges(spark, SF)

    # warm + equivalence
    v_wedge = triangle_count_wedge(edges_fn()).collect()[0][0]
    v_adj = triangle_count(edges_fn()).collect()[0][0]
    print("wedge:", v_wedge, "adj:", v_adj, "match:", v_wedge == v_adj)

    times = {"wedge": [], "adj": []}
    for _ in range(5):
        for name, fn in (("wedge", triangle_count_wedge), ("adj", triangle_count)):
            t0 = time.time()
            fn(edges_fn()).collect()
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(name, [round(t, 2) for t in ts], "median", round(statistics.median(ts), 2))
    spark.stop()


if __name__ == "__main__":
    main()
