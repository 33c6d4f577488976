"""Interleaved A/B timing for q_bfs_distance variants at sf0.1 —
tools/bench_pagerank.py's twin (VERDICT r7 task 3). Scratch tool, not a
test.

Variants:
- cur:      shipped bfs_distances (sym = union-of-flips + distinct).
- nodd:     sym distinct SKIPPED — sound here because the customer
            and offset-supplier id ranges are disjoint, so a flipped
            edge can never collide with an original one and the input
            is already distinct (customer_supplier_edges ends in
            distinct()); saves one full 2m-row shuffle per call.
- nodd_aqe: nodd + no per-round frontier.count() jobs / no manual
            broadcast gate — the frontier join is left to AQE's
            runtime broadcast decision, early-exit via the checkpointed
            frame's isEmpty (same job cost as count, one per round).
"""

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from gps_stream_processing_spark.operators.graph import (
    _fits_broadcast,
    bfs_distances,
)
from gps_stream_processing_spark.plans.graph_queries import (
    customer_supplier_edges,
)
from gps_stream_processing_spark.plans.registry import table, tune_session
from gps_stream_processing_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def bfs_variant(edges: DataFrame, seeds: DataFrame, n_rounds: int = 3,
                skip_sym_distinct: bool = False, aqe_broadcast: bool = False):
    sym = edges.select(F.col("src").alias("s"), F.col("dst").alias("d")).union(
        edges.select(F.col("dst").alias("s"), F.col("src").alias("d"))
    )
    if not skip_sym_distinct:
        sym = sym.distinct()
    sym = sym.localCheckpoint(eager=True).hint("shuffle_hash")
    nodes = sym.select(F.col("s").alias("id")).distinct()
    frontier = (
        seeds.select(F.col(seeds.columns[0]).alias("id"))
        .distinct()
        .join(nodes, "id", "left_semi")
        .localCheckpoint(eager=True)
    )
    dist = frontier.select("id", F.lit(0).alias("dist"))
    for r in range(1, n_rounds + 1):
        if aqe_broadcast:
            if frontier.isEmpty():
                break
            fr = frontier
        else:
            n_frontier = frontier.count()
            if n_frontier == 0:
                break
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


def main():
    spark = get_spark(master="local[32]")
    tune_session(spark, SF)
    edges = customer_supplier_edges(spark, SF)
    seeds = (
        table(spark, SF, "customer")
        .filter(F.col("c_nationkey") == 0)
        .select(F.col("c_custkey").alias("id"))
    )
    runs = {
        "cur": lambda: bfs_distances(edges, seeds, n_rounds=3).count(),
        "nodd": lambda: bfs_variant(edges, seeds, skip_sym_distinct=True).count(),
        "nodd_aqe": lambda: bfs_variant(
            edges, seeds, skip_sym_distinct=True, aqe_broadcast=True
        ).count(),
    }
    for name, fn in runs.items():  # warm-up + row-count sanity
        print(name, "rows:", fn())
    times = {k: [] for k in runs}
    for trial in range(5):
        for name, fn in runs.items():
            t0 = time.time()
            fn()
            times[name].append(round(time.time() - t0, 2))
    for name, ts in times.items():
        print(f"{name}: median {statistics.median(ts):.2f} {ts}")


if __name__ == "__main__":
    main()
