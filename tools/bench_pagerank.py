"""Interleaved A/B timing: current pagerank vs partitioning-preserving
persist variant at sf0.1. Scratch tool, not a test.

Round-6 record: a third variant — broadcasting the NODE-sized ranks
side each round instead of hash-shuffling e_deg — measured faster and
was adopted behind a size gate (operators/graph.py): 5 interleaved
trials at sf0.1, broadcast-ranks [7.99, 10.97, 9.35, 7.86, 8.61]
median 8.61s vs shuffle_hash [10.98, 10.02, 12.44, 9.91, 10.13]
median 10.13s (ambient-noisy window; isolated warm medians 6.7s vs
the r4 driver record 6.97s). The persist experiment below remains the
record of why e_deg is checkpointed, not repartition+persisted."""

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gps_stream_processing_spark.operators.graph import pagerank
from gps_stream_processing_spark.plans.graph_queries import customer_supplier_edges
from gps_stream_processing_spark.plans.registry import tune_session

SF = "/root/testdata/sf0.1"


def pagerank_part(
    edges: DataFrame,
    n_iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition("id")
        .persist()
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    e_deg = (
        e.join(out_deg, "src")
        .select("src", "dst", "deg")
        .repartition("src")
        .persist()
        .hint("shuffle_hash")
    )
    e_deg.count()
    try:
        ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
        for _ in range(n_iterations):
            dist = (
                ranks.join(e_deg, ranks.id == e_deg.src)
                .select(F.col("dst"), (F.col("rank") / F.col("deg")).alias("contrib"))
                .rollup("dst")
                .agg(F.sum("contrib").alias("s"), F.grouping("dst").alias("g"))
                .localCheckpoint(eager=True)
            )
            inbound = dist.filter(F.col("g") == 0).select(
                F.col("dst").alias("id"), F.col("s").alias("inbound")
            )
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
        return ranks.localCheckpoint(eager=True)
    finally:
        nodes.unpersist()
        e_deg.unpersist()


def pagerank_2per(
    edges: DataFrame,
    n_iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """r7 candidate: checkpoint ``dist`` only every SECOND round. The
    un-checkpointed round's join+rollup subtree is embedded (twice —
    two consumers) into the next round's checkpoint job: per 2-round
    block ~3x the round compute in 1 job vs 2x compute in 2 jobs —
    wins only if job-launch overhead exceeds one round's compute.
    Round-7 record: REJECTED — match True, medians of 5 interleaved
    trials at sf0.1: old 5.40s vs 2per 5.46s (per-trial old
    [5.43 5.79 5.17 5.13 5.40], 2per [5.46 5.29 5.24 5.59 6.24])."""
    from gps_stream_processing_spark.operators.graph import _fits_broadcast

    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
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
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    e_deg = (
        e.join(out_deg, "src")
        .select("src", "dst", "deg")
        .localCheckpoint(eager=True)
        .hint("shuffle_hash")
    )
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    bcast_ranks = _fits_broadcast(n)
    for i in range(n_iterations):
        lhs = F.broadcast(ranks) if bcast_ranks else ranks
        dist = (
            lhs.join(e_deg, ranks.id == e_deg.src)
            .select(F.col("dst"), (F.col("rank") / F.col("deg")).alias("contrib"))
            .rollup("dst")
            .agg(F.sum("contrib").alias("s"), F.grouping("dst").alias("g"))
        )
        if i % 2 == 1 or i == n_iterations - 1:
            dist = dist.localCheckpoint(eager=True)
        inbound = dist.filter(F.col("g") == 0).select(
            F.col("dst").alias("id"), F.col("s").alias("inbound")
        )
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


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    tune_session(spark, SF)
    edges_fn = lambda: customer_supplier_edges(spark, SF)

    a = {r["id"]: r["rank"] for r in pagerank(edges_fn()).collect()}
    b = {r["id"]: r["rank"] for r in pagerank_2per(edges_fn()).collect()}
    same = set(a) == set(b) and all(abs(a[i] - b[i]) < 1e-12 for i in a)
    print("match:", same, "n:", len(a))

    times = {"old": [], "2per": []}
    for _ in range(5):
        for name, fn in (("old", pagerank), ("2per", pagerank_2per)):
            t0 = time.time()
            fn(edges_fn()).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 2))
    for name, ts in times.items():
        print(name, ts, "median", statistics.median(ts))
    spark.stop()


if __name__ == "__main__":
    main()
