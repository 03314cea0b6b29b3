"""connected_components_star: the O(log n)-round CC operator must agree with
an exact union-find on arbitrary graphs — including the high-diameter shapes
(paths, chains) that the O(diameter) label-propagation variant is slow on."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from iceberg_benchmark_poc_spark.operators.graph import connected_components_star

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node id per component
    return {x: find(x) for x in parent}


def _run(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {r["node"]: r["component"] for r in connected_components_star(df).collect()}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)), min_size=1, max_size=60
    )
)
@settings(**SETTINGS)
def test_star_cc_matches_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    assert _run(spark, edges) == union_find(edges)


def test_star_cc_on_a_path_graph(spark):
    """Worst case for label propagation (diameter = n); the star algorithm
    must still resolve the whole chain to component 0."""
    n = 33
    got = _run(spark, [(i, i + 1) for i in range(n)])
    assert got == {i: 0 for i in range(n + 1)}


def test_star_cc_on_disjoint_cliques(spark):
    edges = []
    for base in (0, 100, 200):
        nodes = [base + i for i in range(4)]
        edges += [(a, b) for a in nodes for b in nodes if a < b]
    got = _run(spark, edges)
    for base in (0, 100, 200):
        for i in range(4):
            assert got[base + i] == base


# ---------------------------------------------------------------------------
# bfs_distances (q_khop's engine): exact min-hop distances
# ---------------------------------------------------------------------------

from collections import deque

from iceberg_benchmark_poc_spark.operators.graph import bfs_distances


def python_bfs(edges: list[tuple[int, int]], seeds: set[int], hops: int) -> dict[int, int]:
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _run_bfs(spark, edges, seeds, hops):
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node bigint")
    return {r["node"]: r["dist"] for r in bfs_distances(edf, sdf, hops).collect()}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=50
    ),
    seeds=st.sets(st.integers(0, 30), min_size=1, max_size=4),
    hops=st.integers(1, 4),
)
@settings(**SETTINGS)
def test_bfs_matches_reference(spark, edges, seeds, hops):
    """Distances agree with a textbook queue BFS on arbitrary directed
    graphs, seed sets, and radii — including seeds absent from the graph
    (dist 0 rows) and duplicate/self edges."""
    assert _run_bfs(spark, edges, seeds, hops) == python_bfs(edges, seeds, hops)


def test_bfs_on_a_directed_path(spark):
    """A path graph yields dist = index up to the radius, nothing beyond."""
    n, hops = 12, 5
    got = _run_bfs(spark, [(i, i + 1) for i in range(n)], {0}, hops)
    assert got == {i: i for i in range(hops + 1)}


def test_bfs_commits_shortest_path_on_diamonds(spark):
    """A node reachable at hop 1 AND hop 2 must report 1 (BFS optimality,
    the property the anti-join pruning relies on)."""
    edges = [(0, 1), (0, 2), (2, 1), (1, 3), (2, 3)]
    got = _run_bfs(spark, edges, {0}, 3)
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}
