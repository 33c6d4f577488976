"""Graph-operator tests: triangle count on a known graph; PageRank vs
an exact driver-side replica of the same fixed-iteration algorithm."""

from __future__ import annotations

import pytest

from gps_stream_processing_spark.operators.graph import pagerank, triangle_count
from gps_stream_processing_spark.plans.graph_queries import customer_supplier_edges

SF = "/root/testdata/sf0.001"


def test_triangle_count_known_graph(spark):
    # K4 has 4 triangles; plus one pendant edge (no new triangle).
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "src int, dst int",
    )
    assert triangle_count(edges).first()["n_triangles"] == 4


def test_triangle_count_normalizes_direction_and_dupes(spark):
    # same triangle given with mixed directions and duplicates
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3)], "src int, dst int"
    )
    assert triangle_count(edges).first()["n_triangles"] == 1


def test_triangle_count_empty_and_triangle_free(spark):
    # the coalesce path: no join rows at all must yield 0, not null
    empty = spark.createDataFrame([], "src int, dst int")
    assert triangle_count(empty).first()["n_triangles"] == 0
    # a path graph has edges but no closing edge
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src int, dst int")
    assert triangle_count(path).first()["n_triangles"] == 0


def test_triangle_count_plan_shape(spark):
    """The adjacency-intersect plan must keep the fact-sized adjacency
    out of broadcast and out of sort-merge: one ShuffledHashJoin, no
    wedge self-join cascade."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "src int, dst int"
    )
    df = triangle_count(edges)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan
    # exactly one join node (tree line + its detail section)
    assert plan.count("ShuffledHashJoin Inner") == 1
    assert "ShuffledHashJoin" in plan


def _pagerank_reference(edge_list, n_iterations=10, damping=0.85):
    """Exact driver-side replica of operators/graph.py::pagerank —
    same update rule, deterministic Python floats."""
    edges = sorted(set(edge_list))
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(n_iterations):
        inbound = {v: 0.0 for v in nodes}
        dangling = 0.0
        for v in nodes:
            if v not in out:
                dangling += rank[v]
        for a, b in edges:
            inbound[b] += rank[a] / out[a]
        rank = {
            v: (1.0 - damping) / n + damping * (inbound[v] + dangling / n)
            for v in nodes
        }
    return rank


def test_pagerank_matches_exact_replica(spark):
    edges_df = customer_supplier_edges(spark, SF)
    edge_list = [(r["src"], r["dst"]) for r in edges_df.collect()]
    expected = _pagerank_reference(edge_list)
    got = {r["id"]: r["rank"] for r in pagerank(edges_df).collect()}
    assert set(got) == set(expected)
    for v, r in expected.items():
        assert got[v] == pytest.approx(r, abs=1e-9), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_sink_outranks_sources(spark):
    # star: everyone points at node 99 — it must hold the max rank
    edges = spark.createDataFrame(
        [(i, 99) for i in range(1, 6)], "src int, dst int"
    )
    ranks = {r["id"]: r["rank"] for r in pagerank(edges, n_iterations=5).collect()}
    assert max(ranks, key=ranks.get) == 99
