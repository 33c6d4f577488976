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


def lsh_index(
    embeddings: DataFrame,
    n_tables: int = 8,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table random-hyperplane LSH index: one row per (vector,
    table) with an ``n_planes``-bit sign-sketch bucket id per table.
    ``L`` independent tables is the classic recall amplifier —
    P(candidate) = 1-(1-p^planes)^L for per-plane agreement p. In a
    persisted deployment this table is written once, bucketed by
    (table_id, bucket) on disk; here it is computed inline."""
    # The hyperplanes are DATA, not plan: a 64-row broadcast table
    # cross-joined against the corpus, one sign-bit term per
    # (vector, plane) row, collapsed to one bucket per (vector, table)
    # by a partially-aggregated sum. Alternatives measured at sf0.1:
    # inlining each plane as its own literal expression bloats codegen
    # (~5 s cold compile); recomputing plane values arithmetically per
    # row is compact but pays 4096 hash evaluations per vector (~3x
    # warm). The broadcast form is fastest both cold and warm, and at
    # production scale the planes table is exactly what you'd persist.
    rows = [
        (t, p, [_pseudo_plane(dim, t * 97 + p, j) for j in range(dim)])
        for t in range(n_tables)
        for p in range(n_planes)
    ]
    planes_df = embeddings.sparkSession.createDataFrame(
        rows, "table_id int, plane_id int, plane array<double>"
    )
    vec = F.col(vec_col).cast("array<double>")
    return (
        embeddings.select(id_col, vec.alias("v"))
        .join(F.broadcast(planes_df))
        .groupBy(id_col, "table_id")
        .agg(
            F.first("v").alias("v"),
            F.sum(
                F.when(
                    dot(F.col("v"), F.col("plane")) >= 0,
                    F.pow(F.lit(2.0), F.col("plane_id")).cast("int"),
                ).otherwise(0)
            ).alias("bucket"),
        )
        .select(id_col, "v", "table_id", "bucket")
    )


def lsh_bucket_ann(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_tables: int = 8,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_radius: int = 2,
) -> DataFrame:
    """ANN: multi-table random-hyperplane (sign) LSH with multi-probe.
    Candidates = vectors sharing the query's bucket in ANY of the
    ``n_tables`` tables, where the query additionally probes every
    bucket within Hamming distance ``probe_radius`` (bit flips catch
    near misses that fall just across a hyperplane). Exact cosine
    re-rank on the deduped candidate set.

    Measured recall@10 vs the exact top-k, averaged over 5 query
    vectors on the synthetic embeddings (SCALE.md has the full grid):

        radius=1: 0.54 @ sf0.01, 0.72 @ sf0.1
        radius=2: 0.78 @ sf0.01, 0.86 @ sf0.1  (default; no measured
                  latency cost at these scales — the probe list grows
                  to L*(1+8+28)=296 broadcast rows, still O(1))

    Scale shape: the corpus side is one narrow map (or a pre-built
    ``lsh_index`` table bucketed on disk) + an equi-join on
    (table_id, bucket) against a broadcast probe list of
    ``n_tables * (1 + C(n_planes,1) + C(n_planes,2))`` rows at the
    radius-2 default (8×37 = 296) — O(1) either way; the corpus never
    shuffles."""
    # The query side is ONE row: fetch it and sketch it driver-side
    # (the same _pseudo_plane math, so buckets are bit-identical to
    # lsh_index's). This is what a vector-search service does per query
    # — the alternative (a second lsh_index subtree over a 1-row
    # filter) doubled driver plan-compile/codegen cost for zero
    # distributed work. The corpus side stays a JVM column-expression
    # index; only k, the probe list (L*(1+planes) literal rows) and one
    # query vector cross the driver boundary.
    q_row = (
        embeddings.filter(F.col(id_col) == query_vec_id)
        .select(F.col(vec_col).cast("array<double>").alias("qv"))
        .head()
    )
    if q_row is None:
        raise ValueError(f"query vector {query_vec_id!r} not found")
    qv = list(q_row["qv"])

    def _bucket(t: int) -> int:
        b = 0
        for p in range(n_planes):
            d = sum(
                qv[j] * _pseudo_plane(dim, t * 97 + p, j) for j in range(len(qv))
            )
            if d >= 0:
                b |= 1 << p
        return b

    probes: set[tuple[int, int]] = set()
    for t in range(n_tables):
        base = _bucket(t)
        probes.add((t, base))
        if probe_radius >= 1:
            for i in range(n_planes):
                probes.add((t, base ^ (1 << i)))
        if probe_radius >= 2:
            for i in range(n_planes):
                for j in range(i + 1, n_planes):
                    probes.add((t, base ^ (1 << i) ^ (1 << j)))
    probe_df = embeddings.sparkSession.createDataFrame(
        sorted(probes), "q_table int, q_bucket int"
    )

    idx = lsh_index(
        embeddings.filter(F.col(id_col) != query_vec_id),
        n_tables, n_planes, dim, id_col, vec_col,
    )
    qv_lit = F.array(*[F.lit(float(x)) for x in qv])
    return (
        idx.join(
            F.broadcast(probe_df),
            (F.col("table_id") == F.col("q_table"))
            & (F.col("bucket") == F.col("q_bucket")),
            "left_semi",  # membership test — no row multiplication needed
        )
        .select(
            id_col,
            F.round(cosine_sim(F.col("v"), qv_lit), 6).alias("cos_sim"),
        )
        .distinct()  # a vector can match in several tables
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
    label).

    Deliberately joins the FULL matrix (``a != b``) in one pass rather
    than symmetrizing a half-matrix with a union: the union's two
    branches execute in the same stage, so neither ``persist`` nor a
    checkpoint prevents the pairwise join from running twice — one
    full-matrix join measured ~25% faster than half-matrix+union at
    sf0.1 and shuffles embeddings once instead of twice."""
    from pyspark.sql import Window as W

    vec = F.col(vec_col).cast("array<double>")
    a = embeddings.select(
        F.col(id_col).alias("vec_a"), F.col(label_col).alias("la"),
        vec.alias("va"), norm(vec).alias("na"),
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_b"), F.col(label_col).alias("lb"),
        vec.alias("vb"), norm(vec).alias("nb"),
    )
    sym = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") != F.col("vec_b")))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("vec_a").orderBy(F.col("cos_sim").desc(), "vec_b")
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(F.col("vec_a").alias("vec_id"), F.col("rn").alias("rank"),
                F.col("vec_b").alias("neighbor_id"), "cos_sim")
    )


PAIRWISE_SCHEMA = "vec_a long, vec_b long, cos_sim double"


def pairwise_cosine_np(
    embeddings: DataFrame,
    symmetric: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """All-pairs cosine within each label block via one numpy gram
    matrix per Arrow group batch (applyInPandas) — the sanctioned
    group-shaped-linear-algebra crossing: 2000x64 in, narrow pair rows
    out, BLAS does the O(n_block^2 * dim) work ~6x faster than per-pair
    JVM HOF folds at sf0.1. Rounded to 6 dp inside the batch, so
    results are bit-identical to the column path and the DuckDB oracle
    (verified at sf0.01 and sf0.1).

    ``symmetric=False`` yields the (vec_a < vec_b) half-matrix;
    ``symmetric=True`` emits both directions (for per-anchor ranking).

    Scale note: block size is the unit of memory here — a label block
    of n vectors materializes an n x n gram matrix in one Python
    worker. For blocks beyond ~50k vectors, pre-split blocks with a
    salt column (gram tiles) or fall back to the column path.
    """
    import numpy as np
    import pandas as pd

    e = embeddings.select(
        label_col, id_col, F.col(vec_col).cast("array<double>").alias("v")
    )

    def gram(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        m = np.stack(pdf["v"].to_numpy())
        n = m / np.linalg.norm(m, axis=1, keepdims=True)
        g = np.round(n @ n.T, 6)
        iu, ju = np.triu_indices(len(ids), k=1)
        a, b = ids[iu], ids[ju]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        out = pd.DataFrame({"vec_a": lo, "vec_b": hi, "cos_sim": g[iu, ju]})
        if symmetric:
            rev = out.rename(columns={"vec_a": "vec_b", "vec_b": "vec_a"})
            out = pd.concat([out, rev], ignore_index=True)
        return out

    return e.groupBy(label_col).applyInPandas(gram, schema=PAIRWISE_SCHEMA)


def _label_centroids(
    embeddings: DataFrame, vec: Column, label_col: str
) -> DataFrame:
    """Coarse quantizer: per-label centroid (deterministic, no RNG —
    k-means iterations would add nothing on synthetic blocks).
    A 2-level split (sign of first-coordinate residual) was tried and
    REJECTED: on this corpus it scattered true neighbors across
    sub-lists (recall 0.5 -> 0.3 at sf0.1 for the same probed
    fraction) and the extra agg+join pass doubled runtime — more
    lists only pay off with a discriminative splitter."""
    return (
        embeddings.select(label_col, vec.alias("v"))
        .groupBy(label_col)
        .agg(
            F.array(
                *[
                    F.avg(F.element_at("v", i + 1)).alias(f"c{i}")
                    for i in range(64)
                ]
            ).alias("cv")
        )
        .select(F.col(label_col).alias("list_id"), "cv")
    )


def _nearest_list_assignment(
    base: DataFrame, cents: DataFrame, id_col: str
) -> DataFrame:
    """Assignment: nearest centroid per vector (broadcast |labels|
    rows). Tie-break pinned BY CONSTRUCTION to the oracle's
    (cosine DESC, list_id ASC): maximize the struct (dist, -list_id),
    lexicographic — equal cosines fall through to the smaller
    list_id. The data keeps decisions far from ties, but parity must
    not depend on that (ADVICE r5)."""
    dist = dot(F.col("v"), F.col("cv")) / (norm(F.col("v")) * norm(F.col("cv")))
    return (
        base.join(F.broadcast(cents))
        .groupBy(id_col)
        .agg(
            F.first("v").alias("v"),
            F.max_by(
                "list_id",
                F.struct(
                    dist.alias("d"),
                    (-F.col("list_id")).alias("neg_list"),
                ),
            ).alias("list_id"),
        )
    )


def _ivf_probe_lists(
    embeddings: DataFrame,
    cents: DataFrame,
    query_vec_id: int,
    n_probe: int,
    id_col: str,
    vec: Column,
):
    """Query side: nearest n_probe centroids, computed driver-side
    from the collected centroid table (|labels| x dim doubles — bytes,
    the same pattern as lsh_bucket_ann's probe sketch). Returns
    (probe list_ids, raw query vector)."""
    import numpy as np

    crows = cents.collect()
    q_row = (
        embeddings.filter(F.col(id_col) == query_vec_id).select(vec.alias("qv")).head()
    )
    if q_row is None:
        raise ValueError(f"query vector {query_vec_id!r} not found")
    qv = np.array(q_row["qv"])
    sims = sorted(
        (
            float(np.dot(qv, np.array(r["cv"]))
                  / (np.linalg.norm(qv) * np.linalg.norm(np.array(r["cv"])))),
            r["list_id"],
        )
        for r in crows
    )
    return [lid for _, lid in sims[-n_probe:]], qv


def ivf_ann(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_probe: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """ANN via an IVF (inverted-file) index: per-label centroids act as
    the coarse quantizer, every vector is assigned to its NEAREST
    centroid (not its own label — a real quantizer assignment), and a
    query probes only the ``n_probe`` nearest posting lists, exact
    cosine re-rank inside them.

    Scale shape: the centroid table is tiny (|labels| rows) and
    broadcast for assignment (one crossJoin + min_by — no shuffle of
    the corpus beyond the map); at 100 TB the assignment column is
    precomputed and the corpus is partitioned by it on disk, so an
    n_probe search is a partition-pruned scan of n_probe/|lists| of the
    data. The query's probe list is computed driver-side from the
    collected centroid table (|labels| x dim doubles — bytes, the same
    pattern as lsh_bucket_ann's probe sketch)."""
    vec = F.col(vec_col).cast("array<double>")
    base = embeddings.select(id_col, vec.alias("v"))
    cents = _label_centroids(embeddings, vec, label_col)
    assigned = _nearest_list_assignment(base, cents, id_col)
    probe_lists, qv = _ivf_probe_lists(
        embeddings, cents, query_vec_id, n_probe, id_col, vec
    )
    qv_lit = F.array(*[F.lit(float(x)) for x in qv])
    return (
        assigned.filter(
            (F.col("list_id").isin(probe_lists)) & (F.col(id_col) != query_vec_id)
        )
        .select(
            id_col,
            F.round(cosine_sim(F.col("v"), qv_lit), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )


def pq_ann(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    m: int = 16,
    n_codes: int = 16,
    n_cand: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """ANN via PRODUCT QUANTIZATION (the FAISS PQ shape): the vector
    space is split into ``m`` subspaces of ``dim/m`` dims; each
    subspace has its own small codebook trained by Lloyd's k-means,
    and a vector is stored as m code ids — 16 codebooks of 16 codes
    = 16×4 bits = 8 bytes per vector vs 256 bytes float32 (32×).
    Search is ADC (asymmetric distance computation): the query
    builds an m × |codes| LOOKUP TABLE of subspace dot products
    ONCE, each stored vector's approximate score is m table lookups
    (never a d-dim multiply), and only the ``n_cand`` best
    candidates pay an exact re-rank. Completes the FAISS memory-axis
    triad beside SQ8 (uniform per-dim 8-bit) and IVF (partition
    axis): PQ is what production vector stores deploy at 10⁹
    vectors, usually composed as IVF,PQ.

    Codebook training is DETERMINISTIC Lloyd (the operators/
    clustering.py discipline, all m subspaces in ONE pass): init =
    each subspace's slice of the ``n_codes`` lowest-id vectors, one
    assignment round (exact-fold L2 argmin, first-index tie-break:
    array_position of the array_min ≙ the oracle's list_position of
    the list_min), one per-(subspace, code, dim) mean update with
    empty codes keeping their init slice — so the whole
    train→encode→LUT→ADC→re-rank pipeline carries an exact SQL
    oracle (q_kmeans' unrolled-CTE discipline). Measured recall@10
    vs exact cosine: 0.9 at sf0.01 AND sf0.1 (pytest floor 0.6).

    Scale shape: the codebook rides each task's closure (~8 KB);
    training is one assignment projection + one hash-agg whose
    result is m×n_codes×sub_dim ≈ 1 k driver rows (the sanctioned
    bounded-collect pattern); encoding is one scan-side Arrow-batched
    numpy projection (:func:`make_pq_encoder` — no shuffle; bitwise-
    identical to the SQL fold the oracle re-derives, pytest-pinned;
    replaced the interpreted-HOF expression at a measured 3.4×
    whole-key win); the ADC scan reads codes only — the ~32×
    bandwidth cut that keeps exhaustive candidate generation
    feasible at 100 TB — and the exact re-rank touches n_cand
    rows."""
    sub = dim // m
    vec = F.col(vec_col).cast("array<double>")
    base = embeddings.select(id_col, vec.alias("v"))
    cb, cb_rows = _pq_train(base, m, n_codes, sub, id_col)
    enc = base.select(
        id_col, "v", make_pq_encoder(cb_rows, m, sub)(F.col("v")).alias("codes")
    )
    qrow = _pq_query_row(base, cb, query_vec_id, m, sub, id_col)
    cand = (
        enc.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(qrow))
        .select(id_col, "v", "qv", F.round(_pq_adc(m), 6).alias("approx_dot"))
        .orderBy(F.desc("approx_dot"), id_col)
        .limit(n_cand)
    )
    return (
        cand.select(
            id_col,
            "approx_dot",
            F.round(cosine_sim(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def _pq_l2(s: str, x: str, sub: int) -> str:
    return (
        f"aggregate(zip_with(slice({x}, {s} * {sub} + 1, {sub}),"
        f" slice(c, {s} * {sub} + 1, {sub}),"
        " (a, b) -> (a - b) * (a - b)),"
        " 0.0D, (acc, y) -> acc + y)"
    )


def make_pq_encoder(cb_rows: list[list[float]], m: int, sub: int):
    """Vectorized Arrow-batched PQ encoder (the sanctioned class-3
    numpy boundary — the centroid/gram precedent): per batch, ONE
    (rows × codes × sub) einsum-style distance tensor and an argmin,
    replacing the interpreted nested-HOF evaluation of
    :func:`_pq_codes_expr` that dominated pq/ivfpq runtime (the
    16-code L2 fold is ~256 interpreted lambda folds PER ROW; numpy
    does the same arithmetic in one vector op — measured ~2.4→0.2 s
    per encode pass at sf0.1). BITWISE-identical to the SQL fold and
    therefore to the DuckDB oracle: the per-subspace sum reduces 4
    elements sequentially in both (numpy's pairwise summation is
    plain left-to-right below its 8-element block), squares are
    elementwise, and np.argmin takes the FIRST minimal index exactly
    like array_position(array_min)/list_position(list_min) —
    equality pytest-pinned against the expression path. The codebook
    rides the task closure (~8 KB), not a crossJoin. (The UDF body
    lives in functions/pandas_udfs.py — pandas_udf needs
    non-stringified type hints, and this module uses `from
    __future__ import annotations`.)"""
    from gps_stream_processing_spark.functions.pandas_udfs import (
        make_pq_encoder_udf,
    )

    return make_pq_encoder_udf(cb_rows, m, sub)


def _pq_codes_expr(m: int, sub: int, x: str = "v") -> Column:
    """Per-row m-length code array: each subspace's nearest codebook
    entry by exact-fold L2, first-index tie-break (strict-less fold
    keeps the FIRST minimal index ≙ the oracle's list_position of
    the list_min). The argmin is ONE aggregate fold over the
    per-code distance array, so the 16-code L2 transform — the
    hottest expression in pq_ann/ivf_pq_ann encoding — is evaluated
    exactly once per (row, subspace); the previous
    array_position(dists, array_min(dists)) form inlined it twice
    (Catalyst does not CSE across HOF calls). References the
    broadcast ``cbl`` codebook column (n_codes full-dim rows;
    subspace s's codebook is the s-th slice) — column-referencing so
    codegen compiles once (the clustering.py literal lesson).
    ``x`` names the vector column to encode (``rv`` for residual
    encoding in ivf_pq_ann)."""
    dists = f"transform(cbl, c -> {_pq_l2('s', x, sub)})"
    return F.expr(
        f"transform(sequence(0, {m - 1}), s -> aggregate({dists},"
        " struct(cast('Infinity' as double) as d, 0 as i, 0 as j),"
        " (acc, x) -> struct(if(x < acc.d, x, acc.d) as d,"
        " if(x < acc.d, acc.j + 1, acc.i) as i, acc.j + 1 as j),"
        " acc -> cast(acc.i as bigint)))"
    )


def _pq_train(
    base: DataFrame,
    m: int,
    n_codes: int,
    sub: int,
    id_col: str,
    n_rounds: int = 1,
) -> tuple[DataFrame, list[list[float]]]:
    """Deterministic Lloyd PQ training, ALL subspaces in one pass per
    round: init = the n_codes lowest-id vectors (each subspace takes
    its slice), then ``n_rounds`` × (one assignment projection via
    the vectorized Arrow encoder + one (subspace, code, dim) mean
    hash-agg collected driver-side — m*n_codes*sub rows, the _lloyd
    bounded-collect pattern), emptied codes keeping their
    PREVIOUS-round slice. Returns (broadcastable 1-row codebook
    DataFrame, the codebook rows) — callers feed the rows to
    :func:`make_pq_encoder` and the DataFrame to the LUT builder."""
    spark = base.sparkSession

    def cb_df(rows: list[list[float]]) -> DataFrame:
        return spark.createDataFrame([(rows,)], "cbl array<array<double>>")

    init_rows = base.orderBy(id_col).limit(n_codes).collect()
    if len(init_rows) < n_codes:
        raise ValueError(
            f"n_codes={n_codes} but only {len(init_rows)} vectors"
        )
    cur = [list(r["v"]) for r in init_rows]
    for _ in range(n_rounds):
        enc = base.select(
            id_col, "v", make_pq_encoder(cur, m, sub)(F.col("v")).alias("codes")
        )
        upd = (
            enc.select("codes", F.posexplode("v").alias("i", "x"))
            .select(
                (F.col("i") / sub).cast("int").alias("s"),
                F.element_at(
                    "codes", (F.col("i") / sub).cast("int") + 1
                ).alias("code"),
                (F.col("i") % sub).alias("j"),
                "x",
            )
            .groupBy("s", "code", "j")
            .agg(F.avg("x").alias("mv"))
            .collect()
        )
        means: dict[tuple[int, int], dict[int, float]] = {}
        for r in upd:
            means.setdefault((r["s"], r["code"]), {})[r["j"]] = r["mv"]
        nxt = []
        for c in range(n_codes):  # code ids are 1-based (array_position)
            row: list[float] = []
            for s in range(m):
                got = means.get((s, c + 1))
                if got is None:  # emptied code keeps its previous slice
                    row.extend(cur[c][s * sub : (s + 1) * sub])
                else:
                    row.extend(got[j] for j in range(sub))
            nxt.append(row)
        cur = nxt
    return cb_df(cur), cur


def _pq_query_row(
    base: DataFrame,
    cb: DataFrame,
    query_vec_id: int,
    m: int,
    sub: int,
    id_col: str,
) -> DataFrame:
    """1-row (qv, lut): the raw query vector plus the m × n_codes ADC
    lookup table of subspace dot products against the codebook."""
    qdot = (
        f"aggregate(zip_with(slice(qv, s * {sub} + 1, {sub}),"
        f" slice(c, s * {sub} + 1, {sub}), (a, b) -> a * b),"
        " 0.0D, (acc, y) -> acc + y)"
    )
    return (
        base.filter(F.col(id_col) == query_vec_id)
        .select(F.col("v").alias("qv"))
        .crossJoin(F.broadcast(cb))
        .select(
            "qv",
            F.expr(
                f"transform(sequence(0, {m - 1}),"
                f" s -> transform(cbl, c -> {qdot}))"
            ).alias("lut"),
        )
    )


def _pq_adc(m: int) -> Column:
    """ADC score: m LUT hits folded in fixed order (Spark aggregate ≡
    DuckDB list_sum(list_transform) bitwise)."""
    return F.expr(
        f"aggregate(sequence(0, {m - 1}), 0.0D, (acc, s) -> acc"
        " + element_at(element_at(lut, s + 1),"
        " cast(element_at(codes, s + 1) as int)))"
    )


def ivf_pq_ann(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_probe: int = 6,
    m: int = 16,
    n_codes: int = 16,
    n_cand: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
    pq_rounds: int = 3,
) -> DataFrame:
    """IVF × PQ — THE production vector-store composition (FAISS
    ``IVFx,PQy``, what actually runs at 10⁹ vectors): the IVF coarse
    quantizer prunes WHICH vectors are scanned (n_probe posting
    lists), product quantization cuts the BYTES per scanned vector
    (8-byte codes vs 256-byte float32, 32× — deeper than SQ8's 4×),
    ADC scores the probed codes via the query's lookup table, and
    only the ``n_cand`` best pay an exact re-rank.

    Same shared coarse quantizer as :func:`ivf_ann` (per-label
    centroids, identical assignment tie-break); PQ codebooks are
    trained on per-list RESIDUALS x − c(x), not raw vectors — the
    true FAISS IVFADC (Jégou et al. 2011 §III): residual energy is
    much smaller than vector energy, so the same 8 bytes/vector
    quantize a tighter distribution and recall-per-byte improves.
    Scoring decomposes exactly: q·x ≈ q·c_i + q·r̂, where q·c_i is
    ONE dot per probed list (an n_lists-row broadcast, never a
    per-vector d-dim multiply) and q·r̂ is the m-lookup ADC sum
    against the residual-codebook LUT. Training is the same
    deterministic Lloyd as :func:`pq_ann` over the WHOLE corpus's
    residuals (the index is built offline, not per probe — the
    ivf_sq_ann discipline) but runs ``pq_rounds=3`` rounds:
    residuals are near-isotropic once the label-block structure is
    subtracted, so one round under-trains (measured recall@10
    0.7/0.6 at sf0.01/0.1 vs 0.9/0.7 at three rounds — beating raw
    encoding's 0.9/0.6 at the same bytes). The composed pipeline
    still carries an exact SQL oracle (Lloyd rounds unrolled)."""
    sub = dim // m
    vec = F.col(vec_col).cast("array<double>")
    base = embeddings.select(id_col, vec.alias("v"))
    cents = _label_centroids(embeddings, vec, label_col)
    assigned = _nearest_list_assignment(base, cents, id_col)
    probe_lists, _qv = _ivf_probe_lists(
        embeddings, cents, query_vec_id, n_probe, id_col, vec
    )
    # residual table: rv = v − centroid(assigned list); the centroid
    # side is |labels| rows, broadcast. PERSISTED for the pipeline's
    # lifetime (the operators/clustering.py Lloyd discipline): its
    # lineage (scan → centroid agg → assignment agg → join) is
    # consumed by every training round (init collect + pq_rounds
    # update collects) AND the probed-candidate scan — without the
    # persist each of those ~5 jobs re-derives the whole subtree
    # (measured: the plan string alone was 62 KB of duplicated
    # subtrees; whole key 8.5 s at sf0.1). Unpersisted in the finally
    # after the candidate set is eagerly snapshotted off the cache.
    resid = assigned.join(F.broadcast(cents), "list_id").select(
        id_col,
        "list_id",
        "v",
        F.zip_with("v", "cv", lambda a, b: a - b).alias("rv"),
    ).persist()
    try:
        cb, cb_rows = _pq_train(
            resid.select(id_col, F.col("rv").alias("v")),
            m,
            n_codes,
            sub,
            id_col,
            n_rounds=pq_rounds,
        )
        qrow = _pq_query_row(base, cb, query_vec_id, m, sub, id_col)
        # per-list q·c_i constants (n_lists rows, broadcast on list_id)
        qc = cents.crossJoin(F.broadcast(qrow.select("qv"))).select(
            "list_id", dot(F.col("cv"), F.col("qv")).alias("qc_dot")
        )
        probed = (
            resid.filter(
                (F.col("list_id").isin(probe_lists))
                & (F.col(id_col) != query_vec_id)
            )
            .select(
                id_col,
                "list_id",
                "v",
                make_pq_encoder(cb_rows, m, sub)(F.col("rv")).alias("codes"),
            )
            .join(F.broadcast(qc), "list_id")
            .crossJoin(F.broadcast(qrow))
        )
        # n_cand rows, snapshotted eagerly so the returned plan reads
        # off the checkpoint, not the (about-to-be-unpersisted) cache
        cand = (
            probed.select(
                id_col,
                "v",
                "qv",
                F.round(F.col("qc_dot") + _pq_adc(m), 6).alias("approx_dot"),
            )
            .orderBy(F.desc("approx_dot"), id_col)
            .limit(n_cand)
            .localCheckpoint(eager=True)
        )
    finally:
        resid.unpersist()
    return (
        cand.select(
            id_col,
            "approx_dot",
            F.round(cosine_sim(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def ivf_sq_ann(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_probe: int = 6,
    n_cand: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF × SQ8 — the PRODUCTION ANN composition: the IVF coarse
    quantizer prunes WHICH vectors are scanned (n_probe posting
    lists), int8 scalar quantization cuts the BYTES per scanned vector
    (float32 → 8-bit codes, 4×), and only the ``n_cand`` best
    ADC-scored candidates pay an exact re-rank. This is the FAISS
    ``IVFx,SQ8`` index shape — each axis alone is ivf_ann / the SQ8
    plan; composed they multiply: at 100 TB the probed fraction
    streams at a quarter bandwidth.

    Same shared quantizer as :func:`ivf_ann` (per-label centroids,
    identical assignment tie-break), same closed-form quantization as
    the SQ8 key (per-dim min/max over the WHOLE corpus — the index is
    built offline over everything, not per probe)."""
    vec = F.col(vec_col).cast("array<double>")
    base = embeddings.select(id_col, vec.alias("v"))
    cents = _label_centroids(embeddings, vec, label_col)
    assigned = _nearest_list_assignment(base, cents, id_col)
    probe_lists, _qv = _ivf_probe_lists(
        embeddings, cents, query_vec_id, n_probe, id_col, vec
    )
    # SQ stats over the whole corpus (offline index build)
    dims = (
        base.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    stats = dims.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mn))), s -> s.mn)"
        ).alias("mn_arr"),
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mx))), s -> s.mx)"
        ).alias("mx_arr"),
    )
    dq_expr = F.expr(
        "transform(v, (x, i) -> CASE WHEN mx_arr[i] > mn_arr[i] "
        "THEN mn_arr[i] + round((x - mn_arr[i]) * 255.0 "
        "/ (mx_arr[i] - mn_arr[i])) * (mx_arr[i] - mn_arr[i]) / 255.0 "
        "ELSE mn_arr[i] END)"
    )
    # quantize the query through the SAME Spark expression (python
    # round() is banker's vs Spark HALF_UP — never quantize driver-side)
    qrow = (
        base.filter(F.col(id_col) == query_vec_id)
        .crossJoin(F.broadcast(stats))
        .select(dq_expr.alias("qdv"), F.col("v").alias("qv"))
    )
    probed = (
        assigned.filter(
            (F.col("list_id").isin(probe_lists)) & (F.col(id_col) != query_vec_id)
        )
        .crossJoin(F.broadcast(stats))
        .select(id_col, "v", dq_expr.alias("dv"))
        .crossJoin(F.broadcast(qrow))
    )
    adot = F.expr(
        "aggregate(zip_with(dv, qdv, (a, b) -> a * b), 0.0D, (acc, x) -> acc + x)"
    )
    cand = (
        probed.select(id_col, "v", "qv", F.round(adot, 6).alias("approx_dot"))
        .orderBy(F.desc("approx_dot"), id_col)
        .limit(n_cand)
    )
    return (
        cand.select(
            id_col,
            "approx_dot",
            F.round(cosine_sim(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )
