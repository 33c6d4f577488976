"""Interleaved A/B timing: current wedge-join triangle count vs the
adjacency-array-intersect variant at sf0.1. Scratch tool, not a test."""

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


def triangle_count_adj(edges: DataFrame, src_col="src", dst_col="dst") -> DataFrame:
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    adj = e.groupBy("a").agg(F.collect_list("b").alias("nbrs"))
    return (
        e.join(adj.hint("shuffle_hash"), "a")
        .withColumnRenamed("nbrs", "na")
        .join(
            adj.select(F.col("a").alias("b"), F.col("nbrs").alias("nb")).hint(
                "shuffle_hash"
            ),
            "b",
        )
        .agg(
            F.coalesce(
                F.sum(F.size(F.array_intersect("na", "nb"))), F.lit(0)
            )
            .cast("bigint")
            .alias("n_triangles")
        )
    )


def triangle_count_explode(edges: DataFrame, src_col="src", dst_col="dst") -> DataFrame:
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = e.groupBy("a").agg(F.collect_list("b").alias("nbrs")).localCheckpoint(
        eager=True
    )
    lhs = adj.select(
        F.explode("nbrs").alias("b"), F.col("nbrs").alias("na")
    )
    rhs = adj.select(F.col("a").alias("b"), F.col("nbrs").alias("nb")).hint(
        "shuffle_hash"
    )
    return lhs.join(rhs, "b").agg(
        F.coalesce(F.sum(F.size(F.array_intersect("na", "nb"))), F.lit(0))
        .cast("bigint")
        .alias("n_triangles")
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

    # warm
    v_old = triangle_count(edges_fn()).collect()[0][0]
    v_new = triangle_count_adj(edges_fn()).collect()[0][0]
    v_exp = triangle_count_explode(edges_fn()).collect()[0][0]
    print("old:", v_old, "new:", v_new, "exp:", v_exp, "match:", v_old == v_new == v_exp)

    times = {"old": [], "new": [], "exp": []}
    for trial in range(5):
        for name, fn in (
            ("old", triangle_count),
            ("new", triangle_count_adj),
            ("exp", triangle_count_explode),
        ):
            t0 = time.time()
            fn(edges_fn()).collect()
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(name, [round(t, 2) for t in ts], "median", round(statistics.median(ts), 2))
    spark.stop()


if __name__ == "__main__":
    main()
