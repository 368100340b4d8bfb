"""PageRank over edge lists (operators/graphs.py)."""

from __future__ import annotations

import collections

import pytest

from hyped_spark.operators.graphs import pagerank


def _py_pagerank(edges, iters, d=0.85, dp=8):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    deg = collections.Counter(s for s, _ in edges)
    r = {v: round(1.0 / n, dp) for v in nodes}
    for _ in range(iters):
        dang = sum(val for v, val in r.items() if v not in deg)
        base = (1 - d) / n + d * (dang / n)
        inflow = collections.defaultdict(float)
        for s, t in edges:
            inflow[t] += r[s] / deg[s]
        r = {v: round(base + d * inflow.get(v, 0.0), dp) for v in nodes}
    return r


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("e", "e"), ("b", "c"),  # dup edge + self-loop
    ("c", "f"),                          # f is dangling (no out-edges)
]


def test_matches_python_reference(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, iters=4).collect()}
    ref = _py_pagerank(EDGES, 4)
    assert got.keys() == ref.keys()
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-8)
    # probability mass conserved (up to per-step rounding)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_authority_ordering(spark):
    # star graph: everything points at 'hub'
    edges = [(f"n{i}", "hub") for i in range(6)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, iters=5).collect()}
    assert got["hub"] == max(got.values())
    leaves = [v for k, v in got.items() if k != "hub"]
    assert max(leaves) == pytest.approx(min(leaves), abs=1e-12)


def test_deterministic_under_repartition(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    a = sorted(map(tuple, pagerank(df, iters=3).collect()))
    b = sorted(map(tuple, pagerank(df.repartition(7), iters=3).collect()))
    assert a == b


def test_many_iterations_no_plan_explosion(spark):
    # the localCheckpoint-per-round discipline: 12 iterations must neither
    # hang in plan stringification nor slow down superlinearly
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, iters=12).collect()}
    ref = _py_pagerank(EDGES, 12)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-8)


def test_bad_iters_raise(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=0)


def test_pagerank_spec_stage(spark):
    from hyped_spark.plans.spec import _REGISTRY

    df = spark.createDataFrame(EDGES, "src string, dst string")
    out = _REGISTRY["pagerank"]({"iters": 3, "out": "pr"})(df)
    direct = pagerank(df, iters=3, rank_col="pr")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, direct.collect()))
