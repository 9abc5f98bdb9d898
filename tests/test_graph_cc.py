"""Connected-components validation: differential vs a pure-Python union-find
on seeded random graphs, plus structural cases (chains force multi-round
convergence, isolated nodes must self-label)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from aci_export_spark.operators.graph import (
    canonical_per_component,
    connected_components,
)


def _union_find(n_nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {n: n for n in n_nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-id labeling
    return {n: find(n) for n in n_nodes}


def test_chain_needs_multiple_rounds(spark):
    # path graph 1-2-3-4-5-6: min label must walk the whole diameter
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "src long, dst long"
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    assert got == {(i, 1) for i in range(1, 7)}


def test_isolated_nodes_self_label(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,), (9,)], "doc_id long")
    got = {
        (r["node"], r["component"])
        for r in connected_components(
            edges, nodes=nodes, node_col="doc_id"
        ).collect()
    }
    assert got == {(1, 1), (2, 1), (9, 9)}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        nodes = list(range(n))
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(20, 80))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        expected = _union_find(nodes, edges)
        edf = spark.createDataFrame(edges, "src long, dst long")
        ndf = spark.createDataFrame([(x,) for x in nodes], "doc_id long")
        got = {
            r["node"]: r["component"]
            for r in connected_components(edf, nodes=ndf, node_col="doc_id").collect()
        }
        assert got == expected, f"trial {trial}"


def test_bounded_single_task_cc_equals_distributed(spark):
    """The size-gated single-task union-find path (default for edge lists
    <= bounded_edges) must produce the EXACT labeling of the distributed
    star-contraction path (forced with bounded_edges=0) — both compute
    min-reachable-id per node."""
    rng = random.Random(7)
    for trial in range(3):
        n = 80
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(30, 120))
        ]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        edf = spark.createDataFrame(edges, "src long, dst long")
        ndf = spark.createDataFrame([(x,) for x in range(n)], "doc_id long")
        fast = connected_components(edf, nodes=ndf, node_col="doc_id")
        slow = connected_components(
            edf, nodes=ndf, node_col="doc_id", bounded_edges=0
        )
        assert fast.schema == slow.schema
        got_fast = {(r["node"], r["component"]) for r in fast.collect()}
        got_slow = {(r["node"], r["component"]) for r in slow.collect()}
        assert got_fast == got_slow, f"trial {trial}"


def test_canonical_per_component(spark):
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], "node long, component long"
    )
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (9, 5)], "doc_id long, n_chars int"
    )
    kept = canonical_per_component(
        docs, comps, "doc_id", [F.col("n_chars").desc(), F.col("doc_id").asc()]
    ).collect()
    rows = {(r["doc_id"], r["component"], r["cluster_size"]) for r in kept}
    # cluster 1: docs 2 and 3 tie on n_chars=30 → doc 2 wins the id tie-break
    assert rows == {(2, 1, 3), (9, 9, 1)}


def test_triangle_counts_known_graph(spark):
    from aci_export_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant 4-5 and
    # an isolated edge 6-7; edges given in mixed orientation + a duplicate
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 1), (1, 4), (2, 3), (4, 2), (3, 4), (5, 4), (6, 7)],
        "src long, dst long",
    )
    got = {r["node"]: r["triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0, 7: 0}


def test_pagerank_star_center_dominates_and_is_deterministic(spark):
    from aci_export_spark.operators.graph import pagerank_fixed_point

    # star: hub 0 connected to leaves 1..5
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    r1 = {r["node"]: r["rank"] for r in pagerank_fixed_point(edges, iterations=5).collect()}
    r2 = {r["node"]: r["rank"] for r in pagerank_fixed_point(edges, iterations=5).collect()}
    assert r1 == r2  # bit-identical replay
    assert r1[0] > max(r1[i] for i in range(1, 6))  # hub dominates
    leaf_ranks = {r1[i] for i in range(1, 6)}
    assert len(leaf_ranks) == 1  # symmetric leaves tie exactly


def test_partitioned_components_matches_global_cc(spark):
    # random multi-group graph with edges confined to their group (the
    # partitioned operator's precondition): labels must equal the global
    # star-contraction operator's min-id labels exactly
    from aci_export_spark.operators.graph import (
        connected_components,
        partitioned_components,
    )

    rng = random.Random(4)
    rows = []
    for g in range(6):
        ids = [g * 1000 + i for i in range(rng.randint(2, 40))]
        for _ in range(rng.randint(1, 60)):
            rows.append((g, rng.choice(ids), rng.choice(ids)))
    edges = spark.createDataFrame(rows, "cell int, src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in partitioned_components(edges, "cell").collect()
    }
    loops_dropped = edges.filter("src != dst")
    expect = {
        r["node"]: r["component"]
        for r in connected_components(loops_dropped, "src", "dst").collect()
    }
    # self-loop-only nodes: global CC (which drops loops) never sees them,
    # the partitioned operator labels them with themselves — align
    got = {n: c for n, c in got.items() if n in expect}
    assert got == expect


def test_pagerank_bounded_bit_identical_to_distributed(spark):
    # bounded=True runs the identical integer recurrence in one executor
    # task; it must never change a single output bit vs the distributed
    # loop — here on an asymmetric graph (two components, a duplicate
    # and a reversed edge, string node ids like the brand graph)
    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("a", "c"),
            ("x", "y"), ("y", "z"), ("d", "e"), ("e", "a"),
        ],
        "src string, dst string",
    )
    from aci_export_spark.operators.graph import pagerank_fixed_point

    dist = {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(edges, iterations=7).collect()
    }
    bnd = {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(edges, iterations=7, bounded=True).collect()
    }
    assert dist == bnd


def test_long_random_id_chain_converges(spark):
    # regression for the min-label-propagation cap: a 200-node path with
    # randomly permuted ids has diameter 199, far beyond any sane fixed
    # round budget — the star algorithm must converge in O(log² n) rounds
    # (and raise rather than silently truncate if it ever cannot)
    rng = random.Random(99)
    ids = list(range(1000, 1200))
    rng.shuffle(ids)
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)], "src long, dst long"
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    assert got == {(i, 1000) for i in ids}
