"""Scale smoke (SURVEY §5.2.5 / SCALE.md): run the near-dup pipeline on
an 8x-replicated corpus (~40k docs) and assert the *scaling properties*
the 100 TB design claims — candidate generation stays ~linear in the
true-duplicate count (not n²), and duplicates across replicas are found.

This is deliberately the one test that runs above fixture scale; it
keeps no timing asserts (machines vary) — the properties, not the
seconds, are the contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

REPLICAS = 8
SF = "/root/testdata/sf0.01"  # 500 docs -> 4000 after replication


@pytest.fixture(scope="module")
def big_docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    parts = [
        base.select((F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"), "text")
        for i in range(REPLICAS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.cache()


def test_lsh_candidates_subquadratic(spark, big_docs):
    from gps_stream_processing_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_table,
    )

    n = big_docs.count()
    sh = shingle_table(big_docs).persist()
    cands = lsh_candidate_pairs(minhash_signatures(sh))
    n_cands = cands.count()
    # every cross-replica copy pair is a true dup: n_docs * C(8,2) pairs,
    # plus planted near-dups. n² would be ~8e6 pairs; candidates must
    # stay within a small multiple of the true-dup count.
    n_true_dups = (n // REPLICAS) * (REPLICAS * (REPLICAS - 1) // 2)
    assert n_cands >= n_true_dups  # recall over exact copies (J=1)
    assert n_cands < 0.01 * n * n  # sub-quadratic candidate generation
    sh.unpersist()


def test_cross_replica_dups_found(spark, big_docs):
    from gps_stream_processing_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_table,
    )

    sh = shingle_table(big_docs).persist()
    pairs = jaccard_pairs(
        sh, threshold=0.99, candidates=lsh_candidate_pairs(minhash_signatures(sh))
    )
    # doc 7 exists in all 8 replicas with identical text -> its copies
    # must all pair up at J=1 (28 pairs among ids 7, 1000007, ...)
    ids = {7 + i * 1_000_000 for i in range(REPLICAS)}
    got = pairs.filter(
        F.col("doc_a").isin(*ids) & F.col("doc_b").isin(*ids)
    ).count()
    assert got == REPLICAS * (REPLICAS - 1) // 2
    sh.unpersist()


def test_fixed_pivot_budget_collapses_centrality_growth(spark):
    """SCALE.md's harmonic/betweenness production dial, exercised
    (VERDICT r13 item 7): with a FIXED pivot COUNT (not a fixed rate),
    a 4x-replicated graph must cost sub-quadratically more wall time
    (quadratic would be ~16x; the bound here is a generous 8x + fixed
    slack, since the estimators' per-round overheads dominate at this
    size) and the replica-0 scores must agree exactly — the extra
    replicas are disconnected from the pivots, so only the edge-scan
    term grows. The same ~20 pivots are used at both scales, the
    Eppstein-Wang accuracy contract."""
    import time

    from pyspark.sql import functions as F

    from gps_stream_processing_spark.operators.graph import (
        betweenness_sampled,
        per_source_bfs,
    )
    from gps_stream_processing_spark.plans.graph_queries import (
        landed_customer_supplier_edges,
    )

    sf = "/root/testdata/sf0.001"
    base = landed_customer_supplier_edges(spark, sf).select("src", "dst")
    off = 100_000_000

    def replicate(k):
        parts = [
            base.select(
                (F.col("src") + i * off).alias("src"),
                (F.col("dst") + i * off).alias("dst"),
            )
            for i in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # pin so graph construction is excluded from the timed section
        return out.localCheckpoint(eager=True)

    # FIXED budget: the same 20 replica-0 pivots at every scale
    seeds = (
        base.select(F.col("src").alias("id"))
        .distinct()
        .orderBy("id")
        .limit(20)
        .localCheckpoint(eager=True)
    )
    g1, g4 = replicate(1), replicate(4)

    def run(graph):
        t0 = time.time()
        hm = {
            (r.source, r.id): r.dist
            for r in per_source_bfs(graph, seeds, n_rounds=3).collect()
        }
        bm = {
            r.id: r.betweenness
            for r in betweenness_sampled(graph, seeds, n_rounds=3).collect()
        }
        return time.time() - t0, hm, bm

    t1, h1, b1 = run(g1)
    t4, h4, b4 = run(g4)
    # rank agreement: identical reachable sets and per-node values
    assert h4 == h1 and len(h1) > 0
    assert set(b4) == set(b1) and len(b1) > 0
    assert all(abs(b4[k] - b1[k]) <= 1e-6 for k in b1)
    # sub-quadratic wall growth (quadratic at 4x graph would be ~16x)
    assert t4 <= 8 * t1 + 5.0, f"4x replica wall blew up: {t1:.2f}s -> {t4:.2f}s"
