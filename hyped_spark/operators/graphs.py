"""Link-graph operators: PageRank over an edge list.

Web-curation pipelines rank crawl frontiers and weight training mixes by
link-based authority (Common Crawl publishes exactly this: harmonic /
PageRank centrality per domain). The input is the web graph as a plain
(src, dst) edge DataFrame — the shape a 100 TB crawl naturally produces.

:func:`pagerank` is the standard power iteration, written Spark-first:

- per iteration: one join of ranks onto the (pre-partitioned) edge list,
  one hash aggregation of contributions by destination — the two
  unavoidable exchanges of distributed PageRank; out-degrees are computed
  once, outside the loop;
- the dangling-node mass rides as a broadcast 1-row aggregate inside the
  same iteration job (no driver round-trip per iteration — one Spark job
  per round, which is what bounds wall-clock on small graphs where fixed
  job latency dominates);
- each iteration ends in an eager ``localCheckpoint`` with the superseded
  frame released immediately — the loop-plan-explosion discipline from the
  connected-components dedup (a frame referenced twice per round otherwise
  doubles the logical plan every iteration and hangs plan stringification
  around round 7);
- ranks round to ``round_dp`` per iteration, which pins float drift so the
  fixed-iteration run is bit-replayable in DuckDB (same trick as the IVF
  k-means oracle).

Semantics: multigraph (parallel edges each carry weight — duplicate your
edges or pre-``distinct`` them as your crawl demands), self-loops allowed,
``r' = (1-d)/N + d·(dangling/N) + d·Σ_in r/deg`` with N = |nodes seen in
either column|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    round_dp: int | None = 8,
    rank_col: str = "rank",
) -> DataFrame:
    """Fixed-iteration PageRank; returns (node, rank).

    Each iteration ends in an eager localCheckpoint: ranks are referenced
    twice per round (dangling mass + inflow), so fusing rounds into one
    plan duplicates the round's EXCHANGES, not just expressions — measured
    slower even on a 30-node demo graph (2.8s vs 1.9s for 5 rounds).
    Per-round materialization is the right shape at every scale here.
    """
    from hyped_spark.operators.dedup import _release_local_checkpoint

    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("__s").alias("__n"))
        .union(e.select("__d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    deg = e.groupBy("__s").agg(F.count("*").alias("__deg"))
    # degree-annotated edges shuffle ONCE; every iteration's rank join
    # then reuses this frame (ranks are the only moving side)
    ed = e.join(deg, "__s").localCheckpoint(eager=True)

    def _rnd(c):
        return F.round(c, round_dp) if round_dp is not None else c

    ranks = nodes.select(
        "__n", _rnd(F.lit(1.0 / n_nodes)).alias("__r")
    ).localCheckpoint(eager=True)

    for _ in range(iters):
        # dangling mass = Σ rank over nodes with no out-edges, carried as
        # a broadcast 1-row frame so the whole round is ONE Spark job
        dang = F.broadcast(
            ranks.join(deg, ranks["__n"] == deg["__s"], "left_anti")
            .agg(F.coalesce(F.sum("__r"), F.lit(0.0)).alias("__dang"))
        )
        inflow = (
            ed.join(ranks, ed["__s"] == ranks["__n"])
            .groupBy("__d")
            .agg(F.sum(F.col("__r") / F.col("__deg")).alias("__in"))
        )
        # association mirrors the SQL twin exactly: ((1-d)/N + d*(dang/N))
        # + d*inflow, all engine-side doubles
        new = nodes.join(
            inflow, nodes["__n"] == inflow["__d"], "left"
        ).crossJoin(dang).select(
            "__n",
            _rnd(
                F.lit((1.0 - damping) / n_nodes)
                + F.lit(damping) * (F.col("__dang") / F.lit(float(n_nodes)))
                + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
            ).alias("__r"),
        )
        new = new.localCheckpoint(eager=True)
        _release_local_checkpoint(ranks)
        ranks = new

    # final ranks are checkpointed (self-contained) — free the edge and
    # degree frames instead of pinning them until driver GC
    _release_local_checkpoint(e)
    _release_local_checkpoint(ed)
    _release_local_checkpoint(nodes)
    return ranks.select(F.col("__n").alias("node"),
                        F.col("__r").alias(rank_col))


def pagerank_sql(
    edges_cte: str,
    src_expr: str = "src",
    dst_expr: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    round_dp: int = 8,
    rank_col: str = "rank",
) -> str:
    """DuckDB twin: the fixed iteration count unrolls into a CTE chain
    replaying the identical update (same association order, same per-step
    rounding), so ranks match Spark bit-for-bit. ``edges_cte`` is a SQL
    fragment selecting the edge list."""
    d = damping
    parts = [
        f"e AS (SELECT {src_expr} AS s, {dst_expr} AS dst FROM ({edges_cte}))",
        "nodes AS (SELECT DISTINCT n FROM "
        "(SELECT s AS n FROM e UNION ALL SELECT dst FROM e))",
        "nn AS (SELECT count(*) AS c FROM nodes)",
        "deg AS (SELECT s, count(*) AS c FROM e GROUP BY s)",
        f"r0 AS (SELECT n, round(1.0 / (SELECT c FROM nn), {round_dp}) AS r "
        f"FROM nodes)",
    ]
    for k in range(iters):
        prev, cur = f"r{k}", f"r{k + 1}"
        parts.append(
            f"dang{k} AS (SELECT coalesce(sum(r), 0.0) AS m FROM {prev} "
            f"WHERE n NOT IN (SELECT s FROM e))"
        )
        parts.append(
            f"in{k} AS (SELECT e.dst AS n, sum({prev}.r / deg.c) AS s "
            f"FROM e JOIN {prev} ON e.s = {prev}.n "
            f"JOIN deg ON e.s = deg.s GROUP BY e.dst)"
        )
        parts.append(
            f"{cur} AS (SELECT nodes.n, round("
            f"(1.0 - {d!r}) / (SELECT c FROM nn)"
            f" + {d!r} * ((SELECT m FROM dang{k}) / (SELECT c FROM nn))"
            f" + {d!r} * coalesce(in{k}.s, 0.0), {round_dp}) AS r "
            f"FROM nodes LEFT JOIN in{k} ON nodes.n = in{k}.n)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT n AS node, r AS {rank_col} FROM r{iters}"
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int | None = None,
    max_iters: int = 50,
    info: dict | None = None,
) -> DataFrame:
    """Connected components by min-label propagation: every node's label
    converges to the smallest node id in its component — the standalone
    form of the labeling inside ``minhash_dedup(strategy="cc")``
    (dedup.py), exposed for general graphs (near-dup clusters, host
    graphs, citation groups).

    ``iters=None`` (default) iterates to convergence with a changed-count
    check per round; a fixed ``iters`` runs exactly that many rounds —
    deterministic and therefore SQL-replayable (labels are exact integer
    mins, so unlike pagerank there is no rounding contract at all).
    Each round: one join of labels onto the (pre-shuffled, undirected)
    edge list + one min-aggregation — the same two exchanges as pagerank —
    with the identical localCheckpoint-per-round plan discipline.

    Rounds needed = graph diameter (labels spread one hop per round), which
    is fine for web host graphs (effective diameter < ~20) but binds on
    long-chain graphs; :func:`connected_components_star` is the
    O(log²)-round upgrade for that regime. ``info`` (optional dict) is
    filled with ``{"rounds": r, "changed_last": n}`` for scale audits.

    Job-count shape: with a convergence check (``iters=None``) each
    round's label frame is a LAZY localCheckpoint that the changed-count
    action materializes — one Spark job per round, not two. With fixed
    ``iters`` every round is eagerly checkpointed: labels are referenced
    twice per round, and fusing rounds into one plan duplicates the
    round's exchanges (measured slower even on a 60-node demo graph).
    """
    from hyped_spark.operators.dedup import _release_local_checkpoint

    e = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    )
    und = e.union(
        e.select(F.col("__d").alias("__s"), F.col("__s").alias("__d"))
    ).localCheckpoint(eager=True)
    nodes = und.select(F.col("__s").alias("__n")).distinct() \
        .localCheckpoint(eager=True)
    lab = nodes.select("__n", F.col("__n").alias("__l")) \
        .localCheckpoint(eager=True)

    rounds = iters if iters is not None else max_iters
    changed = None
    r = -1
    for r in range(rounds):
        nbr = (
            und.join(lab, und["__s"] == lab["__n"])
            .groupBy("__d").agg(F.min("__l").alias("__m"))
        )
        new = lab.join(nbr, lab["__n"] == nbr["__d"], "left").select(
            "__n",
            F.least(F.col("__l"), F.coalesce(F.col("__m"), F.col("__l")))
            .alias("__l"),
        )
        if iters is None:
            # lazy checkpoint: the changed-count below is the action that
            # materializes the round — one job per round, not two
            new = new.localCheckpoint(eager=False)
            changed = (
                lab.join(new.withColumnRenamed("__l", "__l2"), "__n")
                .filter(F.col("__l") != F.col("__l2")).count()
            )
            if changed == 0:
                _release_local_checkpoint(new)
                break
            _release_local_checkpoint(lab)
        else:
            new = new.localCheckpoint(eager=True)
            _release_local_checkpoint(lab)
        lab = new
    if info is not None:
        info["rounds"] = r + 1
        info["changed_last"] = changed
    if iters is None and changed is not None and changed > 0:
        # Same discipline as dedup.connected_components: a silent exit at
        # max_iters returns split components (a path graph of diameter
        # > max_iters) with no signal otherwise.
        import warnings

        warnings.warn(
            f"connected_components stopped at max_iters={max_iters} with "
            f"{changed} labels still changing — components may be split; "
            "raise max_iters (rounds needed = graph diameter)",
            RuntimeWarning,
            stacklevel=2,
        )
    # the label frame is checkpointed (lineage cut), so the undirected
    # edge copy is no longer referenced — free its blocks now
    _release_local_checkpoint(und)
    return lab.select(F.col("__n").alias("node"),
                      F.col("__l").alias("component"))


def connected_components_sql(
    edges_cte: str,
    src_expr: str = "src",
    dst_expr: str = "dst",
    iters: int = 6,
) -> str:
    """DuckDB twin of ``connected_components(iters=k)`` — the fixed
    iteration count unrolls into exact-integer min-join CTEs."""
    parts = [
        f"e0 AS (SELECT {src_expr} AS s, {dst_expr} AS d "
        f"FROM ({edges_cte}))",
        "und AS (SELECT s, d FROM e0 UNION ALL SELECT d, s FROM e0)",
        "nodes AS (SELECT DISTINCT s AS n FROM und)",
        "l0 AS (SELECT n, n AS l FROM nodes)",
    ]
    for t in range(iters):
        parts.append(
            f"m{t} AS (SELECT und.d AS n, min(l{t}.l) AS m "
            f"FROM und JOIN l{t} ON und.s = l{t}.n GROUP BY und.d)"
        )
        parts.append(
            f"l{t + 1} AS (SELECT nodes.n, "
            f"least(l{t}.l, coalesce(m{t}.m, l{t}.l)) AS l "
            f"FROM nodes JOIN l{t} USING (n) "
            f"LEFT JOIN m{t} USING (n))"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT n AS node, l AS component FROM l{iters}"
    )


def connected_components_star(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 40,
    info: dict | None = None,
) -> DataFrame:
    """Connected components by alternating large-star / small-star rounds
    (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected
    Components in MapReduce and Beyond", SoCC 2014, public paper): each
    round hooks every node's neighbors onto the neighborhood minimum, which
    contracts path distance geometrically — convergence in O(log² n)
    rounds regardless of diameter, vs diameter rounds for the min-label
    propagation in :func:`connected_components`. Use this form when the
    graph can contain long chains (lineage graphs, road-like link spam);
    for web host graphs (effective diameter < ~20) plain propagation runs
    fewer, cheaper rounds.

    Per round: two groupBy-min + join passes over the current edge set —
    the edge set itself is the loop state (no separate label frame), and
    its size only shrinks (large-star output is bounded by the input edge
    count; small-star strictly dedups). Same localCheckpoint-per-round
    plan discipline as the other iterative operators. Convergence check =
    (count, xxhash64-sum) signature equality of the canonical edge set —
    a 1-row aggregate, no driver-side edge payload. Accepted risk: two
    DIFFERENT successive edge sets whose (count, two salted 25-bit-sum)
    signatures collide would stop the loop one round early and return
    split components silently — probability ~2^-50 per round (two
    independent salts, equal counts required), deliberately traded
    against an exact ``exceptAll().limit(1)`` emptiness probe, which
    costs a per-round anti-join instead of a 1-row aggregate.

    Returns (node, component) with component = min node id, identical to
    :func:`connected_components` (fuzz-asserted in tests).
    """
    from hyped_spark.operators.dedup import _release_local_checkpoint

    e0 = edges.select(
        F.col(src_col).alias("__a"), F.col(dst_col).alias("__b")
    )
    nodes = (
        e0.select(F.col("__a").alias("node"))
        .union(e0.select("__b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # canonical undirected edge set, self-loops dropped (they carry no
    # connectivity; their endpoints are already in `nodes`)
    e = (
        e0.filter(F.col("__a") != F.col("__b"))
        .select(F.greatest("__a", "__b").alias("__a"),
                F.least("__a", "__b").alias("__b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _signature(f: DataFrame):
        # two salted order-independent checksums; terms bounded to 2^25 so
        # the ANSI-mode sum cannot overflow below ~2^38 edges
        row = f.agg(
            F.count("*").alias("c"),
            F.coalesce(F.sum(F.pmod(F.xxhash64(F.lit(1), "__a", "__b"),
                                    F.lit(1 << 25))), F.lit(0)).alias("h1"),
            F.coalesce(F.sum(F.pmod(F.xxhash64(F.lit(2), "__a", "__b"),
                                    F.lit(1 << 25))), F.lit(0)).alias("h2"),
        ).collect()[0]  # 1-row aggregate: metadata-sized collect
        return row[0], row[1], row[2]

    def _large_star(f: DataFrame) -> DataFrame:
        # neighbors under BOTH orientations; hook strictly-larger
        # neighbors onto min(N(u) ∪ {u})
        und = f.union(
            f.select(F.col("__b").alias("__a"), F.col("__a").alias("__b"))
        )
        mins = und.groupBy("__a").agg(
            F.min("__b").alias("__m")
        ).select("__a", F.least("__a", "__m").alias("__m"))
        return (
            und.join(mins, "__a")
            .filter(F.col("__b") > F.col("__a"))
            .select(F.col("__b").alias("__a"), F.col("__m").alias("__b"))
            .filter(F.col("__a") != F.col("__b"))
            .distinct()
        )

    def _small_star(f: DataFrame) -> DataFrame:
        # orient (larger → smaller); hook all smaller neighbors (and the
        # node itself) onto the minimum smaller neighbor
        o = f.select(F.greatest("__a", "__b").alias("__a"),
                     F.least("__a", "__b").alias("__b"))
        mins = o.groupBy("__a").agg(F.min("__b").alias("__m"))
        hooked = (
            o.join(mins, "__a")
            .select(F.col("__b").alias("__a"), F.col("__m").alias("__b"))
            .filter(F.col("__a") != F.col("__b"))
        )
        return (
            hooked.union(
                mins.select(F.col("__a"), F.col("__m").alias("__b"))
            )
            .select(F.greatest("__a", "__b").alias("__a"),
                    F.least("__a", "__b").alias("__b"))
            .distinct()
        )

    sig = _signature(e)
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        # LAZY checkpoint: the signature aggregate below is the action
        # that materializes the round's edge set, so each round is ONE
        # Spark job instead of the old eager-checkpoint-then-signature two
        new = _small_star(_large_star(e)).localCheckpoint(eager=False)
        new_sig = _signature(new)
        _release_local_checkpoint(e)
        e, converged = new, new_sig == sig
        sig = new_sig
        if converged:
            break
    else:  # pragma: no cover — O(log² n) bound makes this near-unreachable
        import warnings

        warnings.warn(
            f"connected_components_star stopped at max_rounds={max_rounds} "
            "without reaching a fixed point — components may be split; "
            "raise max_rounds",
            RuntimeWarning,
            stacklevel=2,
        )
    if info is not None:
        info["rounds"] = rounds
    # fixed point: every remaining edge is (node → its component min);
    # component roots and isolated nodes label themselves
    lab = nodes.join(
        e.select(F.col("__a").alias("node"), F.col("__b").alias("__l")),
        "node", "left",
    ).select(
        "node",
        F.coalesce(F.col("__l"), F.col("node")).alias("component"),
    )
    return lab


def hyperball_harmonic(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    radius: int = 3,
    p: int = 4,
    hash_mode: str = "xxhash64",
    info: dict | None = None,
) -> DataFrame:
    """Harmonic centrality via HyperBall (Boldi & Vigna 2013) — the
    algorithm Common Crawl uses for its host-level harmonic rankings.
    Exact harmonic centrality needs all-pairs shortest paths; HyperBall
    replaces each node's reachability ball with an HLL counter
    (operators/sketches.py) and grows balls one hop per round:
    ``counter(v) ∪= counter(u)`` for every in-edge ``u→v``. Then
    ``harmonic(v) = Σ_r (|ball_r(v)| - |ball_{r-1}(v)|) / r`` up to
    ``radius`` hops.

    Per-node state is ≤ ``2^p`` integer registers, the per-round work is
    one edge join + one max-aggregation (the pagerank/CC shape, same
    localCheckpoint discipline), and register maxima are EXACT integers —
    so with ``hash_mode="md5"`` every ball estimate, and therefore the
    centrality itself, replays bit-for-bit in SQL despite being an
    approximation.

    ``info`` (optional dict) records the per-round scale audit —
    ``register_rows`` (total register-table rows, bounded by m·|V|),
    ``max_regs_per_node`` (bounded by m = 2^p), and ``plan_chars`` (length
    of the round frame's analyzed plan string, flat when the
    localCheckpoint lineage cut is doing its job). Costs one extra count
    job per round; leave ``None`` in production.
    """
    from hyped_spark.operators.dedup import _release_local_checkpoint
    from hyped_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    e = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select("__d"))
        .distinct()
    )
    c = hll_registers(
        nodes, "node", p, ("node",), hash_mode
    ).localCheckpoint(eager=True)
    # Delta propagation (the Boldi & Vigna "systolic" optimization, exact
    # under the max-merge semiring): a register (node, bucket, rho) only
    # needs to travel along out-edges in the round AFTER it increased —
    # an unchanged register was already propagated earlier, so re-sending
    # it cannot raise any neighbor's maximum. Round r's edge join
    # therefore reads the previous round's CHANGED registers only. As
    # balls saturate the delta collapses (measured on the 10^5-node bench
    # host graph: the round-3 edge join shrank from ~22M carried register
    # rows to the still-changing fraction; 14.9s → ~7s end to end), and at
    # web scale this is the difference between re-shipping every node's
    # full register table every round and shipping only the frontier.
    delta = c

    def _audit(frame: DataFrame) -> None:
        if info is None:
            return
        row = frame.groupBy("node").count().agg(
            F.count("*").alias("n"), F.sum("count").alias("rows"),
            F.max("count").alias("mx"),
        ).collect()[0]  # 1-row aggregate: metadata-sized collect
        info.setdefault("register_rows", []).append(int(row["rows"] or 0))
        info.setdefault("max_regs_per_node", []).append(int(row["mx"] or 0))
        info.setdefault("plan_chars", []).append(
            len(frame._jdf.queryExecution().analyzed().toString())
        )

    _audit(c)
    balls = [hll_estimate(c, p, ("node",)).localCheckpoint(eager=True)]
    backing = c  # the checkpointed frame behind the current register view
    for _ in range(radius):
        nbr = e.join(delta, delta["node"] == e["__s"]).select(
            F.col("__d").alias("node"), "bucket", "rho"
        )
        # ONE max aggregate computes the merged registers AND the exact
        # delta flag, at the original single-int aggregate width: rows are
        # encoded ``rho*2 + is_old`` before the union, so
        # ``max(enc) >> 1`` is the merged rho and ``max(enc) & 1 == 0``
        # holds exactly when a neighbor contribution strictly increased
        # the register (an old row wins ties via the low bit — no change,
        # not a delta). rho ≤ b+1 ≤ 57 so the encoding stays tiny.
        # The merged frame is a LAZY localCheckpoint — the ball estimate's
        # eager checkpoint below materializes both in ONE job instead of
        # the old checkpoint-then-estimate two-job round.
        merged = (
            c.select("node", "bucket",
                     (F.col("rho") * 2 + 1).alias("__enc"))
            .unionByName(nbr.select("node", "bucket",
                                    (F.col("rho") * 2).alias("__enc")))
            .groupBy("node", "bucket")
            .agg(F.max("__enc").alias("__enc"))
            .localCheckpoint(eager=False)
        )
        c2 = merged.select(
            "node", "bucket",
            F.shiftright(F.col("__enc"), 1).alias("rho"),
        )
        _audit(c2)
        balls.append(hll_estimate(c2, p, ("node",)).localCheckpoint(eager=True))
        delta = merged.filter(F.col("__enc").bitwiseAND(1) == 0).select(
            "node", "bucket",
            F.shiftright(F.col("__enc"), 1).alias("rho"),
        )
        _release_local_checkpoint(backing)
        backing = merged
        c = c2

    # the returned frame depends only on the (small) ball estimates —
    # free the final register table and the edge copy NOW instead of
    # leaving corpus-scale blocks pinned until driver GC
    _release_local_checkpoint(backing)
    _release_local_checkpoint(e)

    out = balls[0].withColumnRenamed("est_distinct", "__b0")
    for r_i in range(1, radius + 1):
        out = out.join(
            balls[r_i].withColumnRenamed("est_distinct", f"__b{r_i}"),
            "node",
        )
    expr = None
    for r_i in range(1, radius + 1):
        term = (
            (F.col(f"__b{r_i}") - F.col(f"__b{r_i - 1}")).cast("double")
            / F.lit(float(r_i))
        )
        expr = term if expr is None else expr + term
    return out.select("node", F.round(expr, 6).alias("harmonic"))


def hyperball_harmonic_sql(
    edges_cte: str,
    src_expr: str = "src",
    dst_expr: str = "dst",
    radius: int = 3,
    p: int = 4,
) -> str:
    """DuckDB twin of :func:`hyperball_harmonic` (md5 mode): replays the
    singleton registers, every per-round max-merge, every ball estimate
    (exact-integer harmonic sums, one division — the
    hll_count_distinct_sql contract), and the left-folded difference
    quotients."""
    from hyped_spark.functions.hashing import h64_sql
    from hyped_spark.operators.sketches import _MASK60, _alpha

    m = 1 << p
    b = 60 - p
    c_num = _alpha(m) * m * m * float(1 << (b + 1))
    h = f"({h64_sql('CAST(node AS VARCHAR)')} & {_MASK60})"

    def est(cte: str, alias: str) -> str:
        return f"""{alias} AS (
            SELECT node,
                CAST(round(CASE WHEN {c_num!r} / (occ_sum + ({m} - occ)
                        * (1::BIGINT << {b + 1}))::DOUBLE <= 2.5 * {m}
                        AND ({m} - occ) > 0
                   THEN {float(m)!r} * ln({float(m)!r} / ({m} - occ)::DOUBLE)
                   ELSE {c_num!r} / (occ_sum + ({m} - occ)
                        * (1::BIGINT << {b + 1}))::DOUBLE
                END) AS BIGINT) AS est
            FROM (
                SELECT node,
                       coalesce(sum((1::BIGINT << ({b + 1} - rho)))::BIGINT,
                                0) AS occ_sum,
                       count(*) AS occ
                FROM {cte} GROUP BY node
            ))"""

    parts = [
        f"eg AS (SELECT {src_expr} AS s, {dst_expr} AS d "
        f"FROM ({edges_cte}))",
        "vx AS (SELECT DISTINCT node FROM "
        "(SELECT s AS node FROM eg UNION ALL SELECT d FROM eg))",
        f"""c0 AS (
            SELECT node, {h} % {m} AS bucket,
                   CASE WHEN {h} // {m} = 0 THEN {b + 1}
                        ELSE bit_count(CAST((({h} // {m})
                             & -({h} // {m})) - 1 AS BIGINT)) + 1
                   END AS rho
            FROM vx)""",
        est("c0", "b0"),
    ]
    for t in range(radius):
        parts.append(
            f"""c{t + 1} AS (
            SELECT node, bucket, max(rho) AS rho FROM (
                SELECT * FROM c{t}
                UNION ALL
                SELECT eg.d AS node, c.bucket, c.rho
                FROM eg JOIN c{t} c ON c.node = eg.s
            ) GROUP BY node, bucket)"""
        )
        parts.append(est(f"c{t + 1}", f"b{t + 1}"))
    terms = "(b1.est - b0.est) / 1.0"
    for r_i in range(2, radius + 1):
        terms = f"({terms} + (b{r_i}.est - b{r_i - 1}.est) / {float(r_i)!r})"
    joins = " ".join(
        f"JOIN b{r_i} USING (node)" for r_i in range(1, radius + 1)
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, round({terms}, 6) AS harmonic FROM b0 {joins}"
    )
