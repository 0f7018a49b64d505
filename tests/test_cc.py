"""Connected components vs a union-find oracle (SURVEY.md §5 test plan)."""

from __future__ import annotations

import random

from mix_blink_spark.operators.cc import clusters_with_singletons, connected_components


def _uf_oracle(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min member per component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _run(spark, edges, threshold=0):
    # threshold=0 pins the DISTRIBUTED large-star/small-star path
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["member"]: r["cluster_id"]
        for r in connected_components(df, small_graph_threshold=threshold).collect()
    }


def test_path_graph_single_component(spark):
    """Chain a-b-c-d-e: transitivity must produce ONE cluster (the
    north-rule convergence case)."""
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    got = _run(spark, edges)
    assert set(got.values()) == {"a"}
    assert set(got) == {"a", "b", "c", "d", "e"}


def test_two_components(spark):
    got = _run(spark, [("a", "b"), ("x", "y"), ("y", "z")])
    assert got["a"] == got["b"] == "a"
    assert got["x"] == got["y"] == got["z"] == "x"


def test_random_graph_matches_union_find(spark):
    rng = random.Random(1234)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(150)]
    oracle = _uf_oracle(edges, nodes)
    df = spark.createDataFrame(edges, "src string, dst string")
    assign = clusters_with_singletons(
        connected_components(df, small_graph_threshold=0),
        df.selectExpr("src as id").union(df.selectExpr("dst")),
        "id",
    )
    got = {r["member"]: r["cluster_id"] for r in assign.collect()}
    touched = {n for e in edges for n in e}
    assert {n: got[n] for n in touched} == {n: oracle[n] for n in touched}


def test_both_paths_agree(spark):
    rng = random.Random(77)
    nodes = [f"n{i:03d}" for i in range(80)]
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(90)]
    distributed = _run(spark, edges, threshold=0)
    local = _run(spark, edges, threshold=10**6)
    assert distributed == local


def test_duplicate_and_self_edges(spark):
    got = _run(spark, [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")])
    assert got == {"a": "a", "b": "a"}
