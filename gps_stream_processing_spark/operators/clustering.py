"""k-means clustering over an embedding column (Lloyd's algorithm).

The reference has no clustering (its only code file is
class.nmea.parser.php:1-399; SURVEY §0) — engine surface (`ext`),
rounding out the iterative-algorithm family (connected components,
PageRank) with the one a training-data pipeline uses for topic
balancing / coverage analysis of a corpus.

Distributed shape (the same one Spark MLlib's KMeans uses): centroids
are k×dim doubles — bytes, not data — so each round broadcasts them to
the executors, assigns every vector to its nearest centroid (narrow
map + one groupBy per round), and collects the k new per-cluster means
back to the driver. The corpus never leaves the cluster; only k rows
cross the driver boundary per round (the sanctioned O(1) driver scalar
pattern, see operators/similarity.py ivf_ann).

The centroids ride as a broadcast 1-row array<array<double>> DataFrame
(crossJoin → BroadcastNestedLoopJoin over one row ≈ a map), NOT as
k×dim literal expressions: the distance fold then references a COLUMN,
so every round generates byte-identical code and whole-stage codegen
compiles once for the whole loop — with literals, each round's 512
fresh constants forced a full recompile (measured at bench SF: 4.5s →
2.1s for the 4-round loop). The assignment stays narrow either way.

Determinism: init is the k lowest-id vectors (no RNG), and per-round
assignment breaks distance ties by cluster index. Per-dimension means
reassociate floating-point sums, so centroid coordinates can drift by
~1e-12 across partitionings — assignments only flip for points within
that distance of equidistant (pytest pins against a numpy replica with
a distance-margin guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    n_iterations: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-iteration Lloyd's k-means; returns (``vec_id``,
    ``cluster``, ``dist``) where cluster ∈ [0, k) and dist is the
    euclidean distance to the final assigned centroid (rounded 6 dp).
    Deterministic init: the k lowest-``id_col`` vectors."""
    if n_iterations < 1:
        raise ValueError(f"n_iterations must be >= 1, got {n_iterations}")
    vec = F.col(vec_col).cast("array<double>")
    # Persist the projected (id, vector) base: the Lloyd loop scans it
    # once per round (plus init) — without this every round re-reads the
    # source parquet, the one 100 TB scale-killer in an otherwise
    # broadcast-centroid loop. Same discipline as the localCheckpoint in
    # connected_components/pagerank; unpersisted before returning (the
    # returned plan re-reads the source once, lazily).
    base = embeddings.select(F.col(id_col).alias("vid"), vec.alias("v")).persist()
    # try/finally: every exit path (the k-too-large ValueError below, a
    # failure inside the Lloyd loop) must release the cache — without it
    # the blocks stay pinned for the session lifetime.
    try:
        return _lloyd(base, k, n_iterations, dim, id_col)
    finally:
        base.unpersist()


def _lloyd(
    base: DataFrame, k: int, n_iterations: int, dim: int, id_col: str
) -> DataFrame:
    init_rows = base.orderBy("vid").limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(
            f"k={k} but the corpus has only {len(init_rows)} vectors"
        )
    centroids = [list(r["v"]) for r in init_rows]  # k × dim doubles
    spark = base.sparkSession

    # squared euclidean of v against every row of the broadcast
    # centroid matrix column — JVM-side fold, whole-stage codegen, no
    # Python boundary; column-referencing so the generated code is
    # round-invariant (see module doc).
    d2s = F.transform(
        F.col("cs"),
        lambda c: F.aggregate(
            F.zip_with(F.col("v"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )

    assigned = None
    for it in range(n_iterations):
        cmat = spark.createDataFrame(
            [(centroids,)], "cs array<array<double>>"
        )
        # materialize the k-distance array once, then argmin over the
        # materialized column — referencing the fold array from several
        # output expressions would lean on codegen CSE to avoid a 3×
        # re-evaluation of k×dim work per row
        assigned = (
            base.crossJoin(F.broadcast(cmat))
            .select("vid", "v", d2s.alias("ds"))
            .select(
                "vid",
                "v",
                (F.array_position("ds", F.array_min("ds")) - 1)
                .cast("int")
                .alias("cluster"),
                F.array_min("ds").alias("d2"),
            )
        )
        if it == n_iterations - 1:
            # The returned assignment uses the *current* centroids — a
            # final centroid update would be discarded, so skip that
            # whole-corpus aggregation job on the last round.
            break
        # per-(cluster, dimension) means via posexplode + ONE avg — the
        # same shuffle volume as dim separate avg(element_at) columns
        # (hash agg partially aggregates before the shuffle either
        # way: k x dim x partitions partial rows), but a 3-expression
        # plan instead of a dim-wide one (measured 0.45s -> 0.08s per
        # update at bench SF — planning dominated the tiny-data cost).
        # k x dim rows collect: still the O(1) driver-scalar pattern.
        new_rows = (
            assigned.select("cluster", F.posexplode("v").alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        dims: dict[int, dict[int, float]] = {}
        for r in new_rows:
            dims.setdefault(r["cluster"], {})[r["i"]] = r["m"]
        by_cluster = {c: [d[i] for i in range(dim)] for c, d in dims.items()}
        # an emptied cluster keeps its previous centroid (standard
        # Lloyd's convention; deterministic)
        centroids = [by_cluster.get(j, centroids[j]) for j in range(k)]
    # Materialize off the cache before the caller's finally unpersists —
    # returning a plan rooted at the (unpersisted) cache would silently
    # re-scan the source when the caller finally executes.
    return assigned.select(
        F.col("vid").alias(id_col),
        "cluster",
        F.round(F.sqrt("d2"), 6).alias("dist"),
    ).localCheckpoint(eager=True)
