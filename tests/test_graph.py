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


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques bridged by one edge: LPA must converge each clique
    to its own minimum id (the bridge's single vote never outweighs
    the 3 in-clique votes), where connected components would flood one
    label across the bridge."""
    from gps_stream_processing_spark.operators.graph import label_propagation

    clique1 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    clique2 = [(a, b) for a in (10, 20, 30, 40) for b in (10, 20, 30, 40) if a < b]
    edges = spark.createDataFrame(
        clique1 + clique2 + [(4, 10)], "src int, dst int"
    )
    got = {r["id"]: r["label"] for r in label_propagation(edges).collect()}
    assert {got[v] for v in (1, 2, 3, 4)} == {1}
    assert {got[v] for v in (10, 20, 30, 40)} == {10}


def test_label_propagation_deterministic_tiebreak(spark):
    """A node with equally frequent neighbor labels must take the
    smallest (path graph 1-2-3 after round 1: node 2 sees {1, 3})."""
    from gps_stream_processing_spark.operators.graph import label_propagation

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    got = {r["id"]: r["label"] for r in label_propagation(edges, n_iterations=1).collect()}
    assert got[2] == 1
    assert got[1] == 2 and got[3] == 2  # their only neighbor's label


def test_label_propagation_frequency_vote_round2(spark):
    """Rounds >= 2 must run the general frequency argmax, not the
    round-1 min-neighbor peel: after round 1 on this graph node 3's
    neighbors carry labels {1, 3, 3} (3 must win by COUNT over the
    smaller label 1) and node 5's carry the tie {2, 3} (2 must win by
    the smallest-label tie-break in the struct-min path)."""
    from gps_stream_processing_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (3, 5), (4, 5)], "src int, dst int"
    )
    # round 1 (identity peel, min neighbor): 1->2, 2->1, 3->2, 4->3, 5->3
    got = {
        r["id"]: r["label"]
        for r in label_propagation(edges, n_iterations=2).collect()
    }
    assert got[3] == 3  # frequency 2 beats the smaller singleton label 1
    assert got[5] == 2  # equal counts -> smallest label


def _lpa_reference(edge_list, n_iterations=3):
    """Exact driver-side replica of operators/graph.py::label_propagation:
    symmetrize, init label = id, per round take the most frequent
    neighbor label with smallest-label tie-break."""
    sym = set()
    for a, b in edge_list:
        if a is not None and b is not None and a != b:
            sym.add((a, b))
            sym.add((b, a))
    nbrs = {}
    for s, d in sym:
        nbrs.setdefault(s, []).append(d)
    lbl = {v: v for v in nbrs}
    for _ in range(n_iterations):
        new = {}
        for v, ns in nbrs.items():
            counts = {}
            for u in ns:
                counts[lbl[u]] = counts.get(lbl[u], 0) + 1
            new[v] = min(counts, key=lambda k: (-counts[k], k))
        lbl = new
    return lbl


def test_label_propagation_matches_exact_replica(spark):
    """The distributed LPA (including the round-1 identity peel) must
    agree exactly with a driver-side replica of the declared semantics
    on the real sf0.001 purchase graph — all-integer algorithm, so no
    tolerance."""
    from gps_stream_processing_spark.operators.graph import label_propagation

    edges_df = customer_supplier_edges(spark, SF)
    edge_list = [(r["src"], r["dst"]) for r in edges_df.collect()]
    expected = _lpa_reference(edge_list)
    got = {r["id"]: r["label"] for r in label_propagation(edges_df).collect()}
    assert got == expected


def test_triangle_skew_gate_decision():
    """The (degree, id)-orientation gate: near-regular graphs stay on
    the cheap id orientation; a hub (max_deg² > 8m) flips it."""
    from gps_stream_processing_spark.operators.graph import (
        _use_degree_orientation,
    )

    assert not _use_degree_orientation(0, 0)  # empty graph
    assert not _use_degree_orientation(2, 600_000)  # co-purchase fixture shape
    assert not _use_degree_orientation(69, 600_000)  # just under the bar
    assert _use_degree_orientation(100, 150)  # star hub
    assert _use_degree_orientation(4_000, 1_000_000)  # scale-free hub


def test_triangle_count_hub_graph_both_orientations_agree(spark):
    """Synthetic hub graph: star center 0 -> 1..60 plus rim edges
    (2i-1, 2i) — each rim edge closes exactly one triangle through the
    hub, so the count is 30. max_deg=60, m=90 -> the skew gate picks
    the (degree, id) orientation (asserted); forcing the id orientation
    by neutralizing the gate must give the identical count — the
    operator's result is orientation-invariant."""
    from unittest import mock

    from gps_stream_processing_spark.operators import graph

    star = [(0, i) for i in range(1, 61)]
    rim = [(2 * i - 1, 2 * i) for i in range(1, 31)]
    edges = spark.createDataFrame(star + rim, "src int, dst int")

    gate_calls = []
    real_gate = graph._use_degree_orientation

    def spy(max_deg, m):
        r = real_gate(max_deg, m)
        gate_calls.append((max_deg, m, r))
        return r

    with mock.patch.object(graph, "_use_degree_orientation", spy):
        n_oriented = graph.triangle_count(edges).first()["n_triangles"]
    assert gate_calls == [(60, 90, True)]  # hub detected -> oriented path

    with mock.patch.object(
        graph, "_use_degree_orientation", lambda *_: False
    ):
        n_id = graph.triangle_count(edges).first()["n_triangles"]
    assert n_oriented == n_id == 30


def test_bfs_distances_hand_graph(spark):
    """Hand graph pins bfs_distances semantics: multi-source min-hop,
    the cap (nodes beyond n_rounds hops excluded), unreachable
    components excluded, seeds absent from the graph ignored, and
    distance = min over SEEDS when a node is reachable from several."""
    from gps_stream_processing_spark.operators.graph import bfs_distances

    # path 1-2-3-4-5-6, seed 1 and seed 5; island 10-11; seed 99 absent
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (5,), (99,)], "id long")
    got = {
        r.id: r.dist
        for r in bfs_distances(edges, seeds, n_rounds=2).collect()
    }
    #   1:0  5:0  2:1(from 1)  4:1(from 5)  6:1(from 5)  3:2(either)
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 6: 1, 3: 2}
    # island 10-11 and the absent seed 99 never appear; cap=1 drops 3
    got1 = {
        r.id: r.dist
        for r in bfs_distances(edges, seeds, n_rounds=1).collect()
    }
    assert got1 == {1: 0, 5: 0, 2: 1, 4: 1, 6: 1}


def test_kcore_hand_graph_and_convergence(spark):
    """kcore_edges semantics on a hand graph: a triangle with a tail —
    the triangle is the 2-core, the tail peels off over two rounds
    (proving peeling iterates, not just filters once). Then the
    registered query's 6-round budget is pinned CONVERGED at the
    verification SF: round 5 == round 6."""
    from gps_stream_processing_spark.operators.graph import kcore_edges
    from gps_stream_processing_spark.plans.graph_queries import (
        landed_copurchase_edges,
    )

    # triangle 1-2-3 plus chain 3-4-5: one peel removes 5 (deg 1),
    # the second removes 4 (deg 1 after 5 left) — a single filter
    # pass would keep 4
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    core = sorted(
        (r.src, r.dst) for r in kcore_edges(edges, k=2, rounds=6).collect()
    )
    assert core == [(1, 2), (1, 3), (2, 3)]
    one_round = {
        (r.src, r.dst) for r in kcore_edges(edges, k=2, rounds=1).collect()
    }
    assert (3, 4) in one_round, "round 1 alone must NOT reach the fixpoint"

    e = landed_copurchase_edges(spark, "/root/testdata/sf0.001")
    r5 = kcore_edges(e, k=2, rounds=5)
    r6 = kcore_edges(e, k=2, rounds=6)
    assert r5.exceptAll(r6).count() == 0 and r6.exceptAll(r5).count() == 0, (
        "6-round budget did not converge at sf0.001 — raise rounds in "
        "q_kcore AND its oracle together"
    )


def test_sssp_hand_graph_weighted_paths(spark):
    """Bellman-Ford on a hand graph where the weighted shortest path
    differs from the hop-shortest one: seed 1, edge (1,3) costs 10 but
    the 2-hop detour 1-2-3 costs 3 — dist(3) must be 3, not 10. Also
    pins the frontier re-relaxation (node 3's dist improves in round 2
    after being settled at 10 in round 1) and the fixpoint early-exit
    (extra rounds don't change the result)."""
    from gps_stream_processing_spark.operators.graph import sssp_distances

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 2), (1, 3, 10), (3, 4, 1)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    got = {
        r.id: r.dist
        for r in sssp_distances(edges, seeds, n_rounds=4).collect()
    }
    assert got == {1: 0, 2: 1, 3: 3, 4: 4}
    # bounded rounds are the contract: 1 round sees the direct edge only
    one = {
        r.id: r.dist
        for r in sssp_distances(edges, seeds, n_rounds=1).collect()
    }
    assert one == {1: 0, 2: 1, 3: 10}
    # past the fixpoint nothing changes (early-exit)
    more = {
        r.id: r.dist
        for r in sssp_distances(edges, seeds, n_rounds=8).collect()
    }
    assert more == got


def _collect_graph(spark):
    from gps_stream_processing_spark.plans.graph_queries import (
        landed_customer_supplier_edges,
    )

    edges = landed_customer_supplier_edges(
        spark, "/root/testdata/sf0.001"
    ).collect()  # sf0.001 graph: hundreds of edges
    adj: dict[int, set[int]] = {}
    for r in edges:
        adj.setdefault(r["src"], set()).add(r["dst"])
        adj.setdefault(r["dst"], set()).add(r["src"])
    return adj


def _brandes(adj, sources, horizon=None):
    """Reference Brandes dependency accumulation (pure Python)."""
    from collections import deque

    bc = {v: 0.0 for v in adj}
    for s in sources:
        if s not in adj:
            continue
        dist = {s: 0}
        sigma = {s: 1}
        order = []
        preds: dict[int, list[int]] = {s: []}
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            if horizon is not None and dist[v] >= horizon:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0
                    preds[w] = []
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_matches_exact_bounded_replica(spark):
    """betweenness_sampled == pure-Python bounded-horizon Brandes with
    the same pivots, to 1e-6 — the operator's distributed forward
    sigma counts and backward dependency sums are EXACT, not
    approximate, for the sampled sources."""
    from pyspark.sql import functions as F

    from gps_stream_processing_spark.operators.graph import (
        betweenness_sampled,
    )
    from gps_stream_processing_spark.plans.graph_queries import (
        landed_customer_supplier_edges,
    )

    e = landed_customer_supplier_edges(spark, "/root/testdata/sf0.001")
    seeds = (
        e.select(F.col("src").alias("id"))
        .distinct()
        .filter(F.col("id") % 7 == 1)
    )
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_sampled(e, seeds, n_rounds=3).collect()
    }
    adj = _collect_graph(spark)
    srcs = [r["id"] for r in seeds.collect()]
    want = _brandes(adj, srcs, horizon=3)
    for v, b in want.items():
        assert abs(got.get(v, 0.0) - b) < 1e-6, (v, got.get(v), b)
    extra = set(got) - set(want)
    assert not extra


def test_betweenness_rank_correlates_with_exact(spark):
    """Rank agreement vs EXACT all-pairs unbounded Brandes: the
    sampled-pivot 3-hop estimate must order nodes consistently with
    the true betweenness (Spearman rho pinned well above chance on
    the sf0.001 graph with a ~14% pivot sample)."""
    from pyspark.sql import functions as F

    from gps_stream_processing_spark.operators.graph import (
        betweenness_sampled,
    )
    from gps_stream_processing_spark.plans.graph_queries import (
        landed_customer_supplier_edges,
    )

    e = landed_customer_supplier_edges(spark, "/root/testdata/sf0.001")
    seeds = (
        e.select(F.col("src").alias("id"))
        .distinct()
        .filter(F.col("id") % 7 == 1)
    )
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_sampled(e, seeds, n_rounds=3).collect()
    }
    adj = _collect_graph(spark)
    exact = _brandes(adj, sorted(adj))  # all sources, unbounded
    common = sorted(set(exact) & set(adj))
    est = [got.get(v, 0.0) for v in common]
    tru = [exact[v] for v in common]

    def _ranks(xs):
        order = sorted(range(len(xs)), key=lambda i: xs[i])
        rk = [0.0] * len(xs)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
                j += 1
            mid = (i + j) / 2.0
            for k in range(i, j + 1):
                rk[order[k]] = mid
            i = j + 1
        return rk

    ra, rb = _ranks(est), _ranks(tru)
    n = len(ra)
    ma, mb = sum(ra) / n, sum(rb) / n
    cov = sum((a - ma) * (b - mb) for a, b in zip(ra, rb))
    va = sum((a - ma) ** 2 for a in ra)
    vb = sum((b - mb) ** 2 for b in rb)
    rho = cov / (va * vb) ** 0.5
    assert rho > 0.55, rho


def test_link_common_neighbors_matches_python_replica(spark):
    """q_link_common_neighbors == a pure-Python per-query two-hop
    common-neighbor argmax over the collected sf0.001 edge list."""
    from gps_stream_processing_spark.plans import REGISTRY

    got = [
        (r["part"], r["degree"], r["predicted"], r["common_neighbors"])
        for r in REGISTRY["q_link_common_neighbors"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    ]
    from gps_stream_processing_spark.plans.graph_queries import (
        landed_copurchase_edges,
    )

    edges = {
        (r["src"], r["dst"])
        for r in landed_copurchase_edges(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    queries = sorted(adj, key=lambda v: (-len(adj[v]), v))[:20]
    want = []
    for q in sorted(queries):
        cn: dict[int, int] = {}
        for v in adj[q]:
            for z in adj[v]:
                if z != q:
                    cn[z] = cn.get(z, 0) + 1
        open_c = {
            z: c
            for z, c in cn.items()
            if (min(q, z), max(q, z)) not in edges
        }
        z, c = min(open_c.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((q, len(adj[q]), z, c))
    assert got == want
