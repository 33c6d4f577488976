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
