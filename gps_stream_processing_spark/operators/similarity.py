"""Similarity search over embedding columns (north star BASELINE.json:6).

- ``cosine_sim``: exact cosine as a JVM-side ``zip_with`` + ``aggregate``
  fold over ``array<double>`` — no Python boundary, whole-stage codegen.
- ``cosine_topk``: brute-force exact top-k against one query vector —
  the correctness baseline. The query side is a broadcast single row, so
  the scan side never shuffles: at 100 TB this is one pass over the
  embeddings + a TakeOrderedAndProject.
- ``lsh_bucket_ann``: the scale path — random-hyperplane LSH buckets
  (sign-bit sketch via deterministic pseudo-planes), candidates only
  within matching buckets; exact re-rank on candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against the stored vector ``query_vec_id``.
    Broadcast the 1-row query side; deterministic ordering via
    (similarity desc, id)."""
    vec = F.col(vec_col).cast("array<double>")
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(vec.alias("qv"))
    return (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.round(cosine_sim(vec, F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    same_label_only: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, pairwise). The
    ``same_label_only`` blocking keeps the join from going full
    cartesian; the true scale path is ``lsh_bucket_ann``."""
    vec = F.col(vec_col).cast("array<double>")
    # Precompute each vector's norm ONCE before the pairwise join —
    # computing norms inside the pair projection would fold every array
    # 3× per pair instead of 1× per vector (measured ~40% of q_knn /
    # q_dedup_embedding wall-clock at sf0.1).
    a = embeddings.select(
        F.col(id_col).alias("vec_a"),
        F.col(label_col).alias("la"),
        vec.alias("va"),
        norm(vec).alias("na"),
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_b"),
        F.col(label_col).alias("lb"),
        vec.alias("vb"),
        norm(vec).alias("nb"),
    )
    cond = F.col("vec_a") < F.col("vec_b")
    if same_label_only:
        cond = cond & (F.col("la") == F.col("lb"))
    return (
        a.join(b, cond)
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _pseudo_plane(dim: int, plane_id: int, j: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    a fixed integer hash of (plane_id, j) — reproducible across runs
    with no RNG (and hence resumable/plannable)."""
    h = (plane_id * 1_000_003 + j * 7_919 + 12_345) % 104_729
    return (h / 104_729.0) * 2.0 - 1.0


def lsh_bucket_ann(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: random-hyperplane (sign) LSH. Each vector gets an
    ``n_planes``-bit bucket id from the sign of <v, plane_i>; search
    re-ranks exactly only within the query's bucket. One narrow map +
    one equi-join on a small int key — the 100 TB shape (bucket id can
    also be a partition/bucketing column on disk)."""
    vec = F.col(vec_col).cast("array<double>")

    def bucket_bits(v: Column) -> Column:
        bits = []
        for p in range(n_planes):
            plane = F.array(*[F.lit(_pseudo_plane(dim, p, j)) for j in range(dim)])
            bits.append(F.when(dot(v, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        return sum(bits[1:], bits[0])

    with_bucket = embeddings.select(
        id_col, vec.alias("v"), bucket_bits(vec).alias("bucket")
    )
    q = with_bucket.filter(F.col(id_col) == query_vec_id).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    return (
        with_bucket.filter(F.col(id_col) != query_vec_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select(
            id_col,
            "bucket",
            F.round(cosine_sim(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )


def knn_per_label(
    embeddings: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k nearest neighbors within each label group (label = blocking
    key → |labels| independent pairwise blocks, each shuffled by
    label)."""
    from pyspark.sql import Window as W

    pairs = cosine_pairs(embeddings, threshold=-1.0, same_label_only=True,
                         id_col=id_col, vec_col=vec_col, label_col=label_col)
    sym = pairs.unionByName(
        pairs.select(
            F.col("vec_b").alias("vec_a"), F.col("vec_a").alias("vec_b"), "cos_sim"
        )
    )
    w = W.partitionBy("vec_a").orderBy(F.col("cos_sim").desc(), "vec_b")
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(F.col("vec_a").alias("vec_id"), F.col("rn").alias("rank"),
                F.col("vec_b").alias("neighbor_id"), "cos_sim")
    )
