"""Link-graph analytics goldens: PageRank vs a pure-Python power
iteration, connected components vs union-find, synthesized edges vs
the closed-form formula, degree stats — plus a randomized fuzz sweep
for components (the star-contraction algorithm's correctness is not
obvious by inspection, so it is pinned against union-find on random
graphs)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from crawler import graph


def _py_pagerank(edges, n_iter=5, damping=0.85, dp=9):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    odeg = {}
    for u, _ in edges:
        odeg[u] = odeg.get(u, 0) + 1
    rank = {u: round(1.0 / n, dp) for u in nodes}
    for _ in range(n_iter):
        contrib = {u: 0.0 for u in nodes}
        for u, v in edges:
            contrib[v] += rank[u] / odeg[u]
        rank = {
            u: round((1.0 - damping) / n + damping * contrib[u], dp)
            for u in nodes
        }
    return rank


def _py_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_synth_edges_formula(spark):
    docs = spark.range(20).select(F.col("id").alias("doc_id"))
    got = {
        (r["src"], r["dst"])
        for r in graph.synth_edges(docs, 20).collect()
    }
    want = set()
    for d in range(20):
        for j in (1, 2, 3):
            raw = (d * 31 + j * 97) % 20
            want.add((d, (d + 1) % 20 if raw == d else raw))
    assert got == want
    # no dangling nodes, no self-loops
    assert {s for s, _ in got} == set(range(20))
    assert all(s != t for s, t in got)


def test_link_stats(spark):
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 2)], "src long, dst long"
    )
    got = {r["node"]: (r["outdeg"], r["indeg"]) for r in
           graph.link_stats(edges).collect()}
    assert got == {0: (2, 0), 1: (1, 1), 2: (0, 3), 3: (1, 0)}


def test_pagerank_matches_python_power_iteration(spark):
    random.seed(7)
    edges = list({
        (random.randrange(30), random.randrange(30)) for _ in range(80)
    })
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in graph.pagerank(df, n_iter=5).collect()}
    want = _py_pagerank(edges, n_iter=5)
    assert set(got) == set(want)
    for u in want:
        assert abs(got[u] - want[u]) < 1e-9, (u, got[u], want[u])


def test_pagerank_mass_conserved_without_dangling(spark):
    # ring graph: every node has out-degree 1 -> total rank stays 1
    n = 40
    df = spark.range(n).select(
        F.col("id").alias("src"), F.pmod(F.col("id") + 1, F.lit(n)).alias("dst")
    )
    total = graph.pagerank(df, n_iter=8).agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-6


def test_components_chain_and_clique(spark):
    # a 5-chain, a 3-clique, one isolated pair
    pairs = [(10, 11), (11, 12), (12, 13), (13, 14),
             (20, 21), (21, 22), (20, 22),
             (30, 31)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {r["node"]: r["rep"] for r in
           graph.connected_components(df).collect()}
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
                   20: 20, 21: 20, 22: 20, 30: 30, 31: 30}


def test_components_fuzz_vs_union_find(spark):
    random.seed(1234)
    for trial in range(3):
        n = 60
        pairs = list({
            tuple(sorted((random.randrange(n), random.randrange(n))))
            for _ in range(45)
        })
        pairs = [(a, b) for a, b in pairs if a != b]
        df = spark.createDataFrame(pairs, "a long, b long")
        got = {r["node"]: r["rep"] for r in
               graph.connected_components(df).collect()}
        want = _py_components(pairs)
        assert got == want, f"trial {trial}"
