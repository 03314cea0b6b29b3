"""Distributed connected components in O(log n) rounds.

The label-propagation CC in queries/textpipe.py converges in O(diameter)
rounds — ideal for near-clique duplicate clusters (diameter 2-3), linear in
the worst case (a path graph needs n rounds). This module implements the
alternating large-star / small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — public literature), which
converges in O(log n) rounds on ANY graph shape, the scale-correct choice
when cluster diameter is unbounded (chained near-duplicates, link graphs).

Both operators are one groupBy each per round:

- large-star: for each node u, connect every strictly-larger neighbor to the
  minimum of u's neighborhood (including u itself);
- small-star: orient edges toward smaller ids; for each node u, connect all
  its (smaller) neighbors and u to the minimum of the closed neighborhood.

The fixed point is a star forest: every node points at its component's
minimum. Convergence is detected by the edge multiset hash going stable —
one scalar agg per round, same pattern as the label-propagation loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MAX_STAR_ROUNDS = 25  # ceil(log2(n)) + slack; a backstop, not the driver


def _sym(edges: DataFrame) -> DataFrame:
    """Undirected view: both orientations of every edge, self-loops dropped."""
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).filter("u <> v")
    return e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v > u, where m = min(closed neighborhood)."""
    nbr = _sym(edges)
    m = nbr.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        nbr.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient toward smaller ids; connect each small neighbor (and u) to m."""
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).filter("u <> v")
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    joined = oriented.join(m, "u")
    to_small = joined.select(F.col("v").alias("src"), F.col("m").alias("dst"))
    u_to_m = joined.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return to_small.unionByName(u_to_m).filter("src <> dst").distinct()


def connected_components_star(edges: DataFrame) -> DataFrame:
    """(node, component) for every node on an edge; component = min node id.

    Input: DataFrame with columns (src, dst). Output covers every distinct
    endpoint; singleton nodes (no edges) are the caller's concern, exactly
    like the label-propagation variant.
    """
    cur = edges.select("src", "dst").filter("src <> dst").distinct().localCheckpoint(eager=False)
    prev_sig = None
    converged = False
    for _ in range(MAX_STAR_ROUNDS):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        # edge-multiset signature: order-insensitive sum of a mixed hash —
        # one scalar agg materializes the round (same job-count pattern as
        # the label-propagation convergence check)
        sig = cur.select(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("n"),
        ).collect()[0]
        sig = (sig["s"], sig["n"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # callers use this as the CORRECTNESS fallback for high-diameter
        # graphs — returning an under-merged (and possibly inconsistent)
        # mapping here would silently break that guarantee. 25 rounds covers
        # ~2^25 nodes; raise the cap for larger graphs rather than trusting
        # a truncated fixed point.
        raise RuntimeError(
            f"connected_components_star did not converge in {MAX_STAR_ROUNDS} rounds; "
            "increase MAX_STAR_ROUNDS (O(log2 n) rounds are required)"
        )
    # at the fixed point every edge is (node, root); nodes that ARE roots
    # appear only as dst — union them in as their own component
    members = cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = cur.select(F.col("dst").alias("node")).distinct().join(
        members.select(F.col("node")), "node", "left_anti"
    ).select("node", F.col("node").alias("component"))
    return members.unionByName(roots)


def bfs_distances(edges: DataFrame, seeds: DataFrame, hops: int) -> DataFrame:
    """Frontier-pruned BFS: exact min hop distance from a seed set.

    ``edges`` is a directed (src, dst) edge list (symmetrize before calling
    for undirected semantics); ``seeds`` is a (node) DataFrame. Returns
    (node, dist) for every node reachable within ``hops``, dist being the
    true minimum hop count (BFS optimality: a node is committed the first
    round it appears, so later paths can never improve it).

    Each round expands only the previous frontier and anti-joins the
    visited set — |frontier|-proportional work per round, never
    |reachable|-proportional. Every frontier is lazily localCheckpoint-ed:
    each is referenced twice (the union and the next round), so without
    lineage truncation the plan re-derives earlier rounds combinatorially.
    The unrolled plan stays lazy end to end — no collect, no driver state
    beyond the loop index.
    """
    seeds = seeds.select("node").distinct()
    visited = seeds.withColumn("dist", F.lit(0).cast("bigint"))
    frontier = seeds
    for hop in range(1, hops + 1):
        nxt = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=False)
        )
        visited = visited.unionAll(nxt.withColumn("dist", F.lit(hop).cast("bigint")))
        frontier = nxt
    return visited
