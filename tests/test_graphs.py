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


def _py_components(edges):
    import collections

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for s, d in edges:
        union(s, d)
    comp = collections.defaultdict(set)
    for n in list(parent):
        comp[find(n)].add(n)
    return {n: min(ns | {root}) for root, ns in comp.items() for n in ns}


def test_connected_components_matches_union_find(spark):
    import random

    from hyped_spark.operators.graphs import connected_components

    rng = random.Random(7)
    edges = [(rng.randint(0, 80), rng.randint(0, 80)) for _ in range(120)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component
           for r in connected_components(df).collect()}
    assert got == _py_components(edges)
    # fixed-iteration mode converges to the same labels once rounds cover
    # the diameter (81 nodes -> 81 rounds is a safe overshoot)
    fixed = {r.node: r.component
             for r in connected_components(df, iters=12).collect()}
    # 12 rounds may or may not fully converge on a random graph; the
    # convergence-mode result is the ground truth, so only check agreement
    # where propagation has finished (labels can only DECREASE over rounds)
    assert all(fixed[n] >= got[n] for n in got)


def test_connected_components_chain_exact(spark):
    from hyped_spark.operators.graphs import connected_components

    # two chains: 0-1-2-3 and 10-11-12
    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 12: 10}


def test_hyperball_harmonic_exact_on_small_graph(spark):
    """At p=12 (4096 registers) on a tiny graph, HLL balls are exact with
    overwhelming probability, so HyperBall must reproduce true harmonic
    centrality (computed by BFS) exactly."""
    import collections

    from hyped_spark.operators.graphs import hyperball_harmonic

    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("e", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.harmonic
           for r in hyperball_harmonic(df, radius=4, p=12).collect()}

    # reference: BFS over REVERSED edges gives dist(u -> v) for each v
    fwd = collections.defaultdict(set)
    for s, d in edges:
        fwd[s].add(d)
    nodes = sorted({x for e in edges for x in e})
    ref = {}
    for v in nodes:
        dist = {v: 0}
        frontier = [v]
        while frontier:
            nxt = []
            for u in nodes:
                for w in fwd[u]:
                    if w in dist and u not in dist:
                        dist[u] = dist[w] + 1
                        nxt.append(u)
            if not nxt:
                break
            frontier = nxt
        ref[v] = round(sum(1.0 / d for u, d in dist.items() if d > 0), 6)
    for v in nodes:
        assert got[v] == ref[v], (v, got[v], ref[v])


def test_hyperball_deterministic(spark):
    from hyped_spark.operators.graphs import hyperball_harmonic

    edges = [(f"n{i}", f"n{(i * 7 + 2) % 13}") for i in range(30)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(map(tuple, hyperball_harmonic(df, radius=3, p=4).collect()))
    b = sorted(map(tuple,
                   hyperball_harmonic(df.repartition(9), radius=3,
                                      p=4).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# large-star/small-star CC (the O(log²)-round variant) + host-graph scale
# ---------------------------------------------------------------------------


def test_star_cc_matches_propagation_fuzz(spark):
    """Alternating large/small-star labels equal min-label propagation on
    random multigraphs, self-loops, duplicates, and isolated pairs."""
    import random

    from hyped_spark.operators.graphs import (connected_components,
                                              connected_components_star)

    rng = random.Random(13)
    cases = [
        [(rng.randrange(30), rng.randrange(30)) for _ in range(rng.randint(3, 50))]
        for _ in range(4)
    ]
    cases.append([(1, 1), (2, 3), (3, 2), (4, 5), (5, 6), (9, 9)])
    for t, edges in enumerate(cases):
        df = spark.createDataFrame(edges, "src long, dst long")
        a = {r.node: r.component
             for r in connected_components(df, max_iters=100).collect()}
        b = {r.node: r.component
             for r in connected_components_star(df).collect()}
        assert a == b, f"case {t}: star CC diverged from propagation"


def test_star_cc_beats_diameter_on_chains(spark):
    """A diameter-100 path needs 100 propagation rounds but O(log) star
    rounds — the regime the star variant exists for."""
    from hyped_spark.operators.graphs import connected_components_star

    df = spark.createDataFrame([(i, i + 1) for i in range(100)],
                               "src long, dst long")
    info = {}
    out = connected_components_star(df, info=info).collect()
    assert all(r.component == 0 for r in out) and len(out) == 101
    assert info["rounds"] <= 10, f"expected O(log n) rounds, got {info['rounds']}"


def test_star_cc_warns_when_round_budget_exhausted(spark):
    import warnings

    from hyped_spark.operators.graphs import connected_components_star

    df = spark.createDataFrame([(i, i + 1) for i in range(40)],
                               "src long, dst long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components_star(df, max_rounds=1).collect()
    assert any("max_rounds" in str(x.message) for x in w)


def test_host_graph_scale_cc_and_hyperball(spark):
    """Round-6 verdict task: the graph operators on a synthetic host graph
    at real parameters — 10^5 nodes, power-law out-degree (hub node 0 has
    64 out-links, the tail has 1), HyperBall at p=12 — asserting the
    invariants that make them safe at 100×:

    - HyperBall per-node state stays ≤ m = 2^p registers and the register
      table stays ≤ m·|V| rows at every round (the state bound IS the
      scale contract of sketch-based centrality);
    - the per-round plan string length is FLAT (localCheckpoint lineage
      cut working — the failure mode is combinatorial plan growth that
      hangs the driver around round 7);
    - min-label CC converges well under the round budget on a hub-and-
      spoke web shape (rounds = distance from the min-id node), the star
      variant converges in fewer rounds still, and both agree.
    """
    from pyspark.sql import functions as F

    from hyped_spark.operators.graphs import (connected_components,
                                              connected_components_star,
                                              hyperball_harmonic)

    N = 100_000
    edges = (
        spark.range(N)
        .select(F.col("id").alias("src"),
                F.explode(F.sequence(
                    F.lit(0),
                    F.least(F.lit(63),
                            (F.lit(N) / (F.col("id") + 1)).cast("long")),
                )).alias("j"))
        .select("src", F.pmod(F.xxhash64("src", "j"), F.lit(N)).alias("dst"))
        .localCheckpoint(eager=True)
    )
    assert edges.count() > 500_000  # ~573k edges

    info = {}
    cc = connected_components(edges, info=info)
    labels = {r.node: r.component for r in cc.collect()}
    assert len(labels) == N
    assert info["changed_last"] == 0, "did not converge"
    assert info["rounds"] <= 15, f"hub graph should converge fast: {info}"

    sinfo = {}
    slabels = {r.node: r.component
               for r in connected_components_star(edges, info=sinfo).collect()}
    assert slabels == labels
    assert sinfo["rounds"] <= info["rounds"]

    p, radius, m = 12, 3, 1 << 12
    hinfo = {}
    h = hyperball_harmonic(edges, radius=radius, p=p, info=hinfo)
    assert h.count() == N
    assert len(hinfo["register_rows"]) == radius + 1
    assert all(r <= m * N for r in hinfo["register_rows"])
    assert all(x <= m for x in hinfo["max_regs_per_node"])
    rows = hinfo["register_rows"]
    assert all(a <= b for a, b in zip(rows, rows[1:])), \
        "ball growth must be monotone (register merge is a max)"
    pc = hinfo["plan_chars"]
    # pc[0] is the bare initial register checkpoint; per-round frames are a
    # fixed-size projection over the round's checkpointed merge (the rho/
    # delta bit-decode), so the flatness guard is over the ROUND frames:
    # lineage is cut iff the plan string stops growing round-over-round
    rounds_pc = pc[1:]
    assert max(rounds_pc) <= 2 * min(rounds_pc), \
        f"plan growth across rounds: {pc}"
