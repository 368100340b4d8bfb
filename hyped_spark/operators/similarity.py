"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline. Dot
  products are native (``zip_with`` + ``aggregate``), top-k is a window rank
  per query. Cost O(n_queries × n_corpus): fine when one side broadcasts.
- ``lsh_topk``: the scale path — random-hyperplane LSH (sign sketch) buckets
  the corpus; a query only scores candidates sharing a band. Hyperplanes are
  derived from a seeded hash (deterministic, identical across executors) and
  applied natively via precomputed per-dimension sign arrays.
- ``embedding_neardup_pairs``: corpus self-near-dup via banded multi-table
  sign sketches (candidate = collide in any band, verify cosine once).

At 1000-executor scale: the corpus-side projection (id, sketch, norm) is
what shuffles — never the raw vectors twice; candidate scoring is a bucket
join; AQE handles bucket skew.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hyped_spark.operators.common import spread


def dot_col(a: Column, b: Column, dim: int | None = None) -> Column:
    """Native dot product of two float arrays.

    With ``dim`` known, the fold unrolls to a flat left-associated sum of
    products — the SAME additions in the SAME order as the HOF fold
    (bit-identical doubles) as codegen arithmetic. MEASURED CAVEAT: at
    dim 64 the unrolled chains made the ANN scoring queries ~2× SLOWER
    end-to-end (alternating fresh-JVM A/B at sf0.1: sq8 ~5.3s HOF vs
    ~10.5s unrolled; the optimizer/codegen cost of the ~400-node trees
    dominates at these row counts) — the scoring call sites therefore
    keep the HOF fold, and ``dim`` should only be passed for SMALL
    arrays (the m=4 PQ ADC fold uses the unrolled form profitably)."""
    if dim is not None:
        expr: Column = F.lit(0.0)
        for d in range(dim):
            expr = expr + a[d] * b[d]
        return expr
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        expr: Column = F.lit(0.0)
        for d in range(dim):
            expr = expr + a[d] * a[d]
        return F.sqrt(expr)
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot_col(a, b, dim) / (norm_col(a, dim) * norm_col(b, dim))


def _scored_cosine(qv: Column, cv: Column, qn: Column, cn: Column,
                   dim: int | None = None) -> Column:
    """Cosine from a post-join dot product and PRE-JOIN per-side norms.

    Every top-k/near-dup operator precomputes ``norm(v)`` once per row
    before its candidate join — computing norms inside ``cosine_col``
    re-reduced both arrays once per PAIR, which measured 3× slower on the
    brute-force path at sf0.1 (1.67s → 0.54s, identical values: the same
    sqrt-of-sum is just evaluated in the earlier projection)."""
    return F.round(dot_col(qv, cv, dim) / (qn * cn), 6)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query (broadcast the smaller query side)."""
    from pyspark.sql import Window

    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv")) \
               .withColumn("__qn", norm_col(F.col("__qv")))
    # narrow projection BEFORE spread (pruning doesn't push through repartition)
    c = spread(corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))) \
        .withColumn("__cn", norm_col(F.col("__cv")))
    scored = c.join(F.broadcast(q)).withColumn(
        "cosine",
        _scored_cosine(F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn")),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane sketching (deterministic)
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    """n_bits × dim matrix of ±1 hyperplane signs from a seeded SHA stream."""
    rows = []
    for i in range(n_bits):
        d = hashlib.sha256(f"hyperplane|{seed}|{i}".encode()).digest()
        # expand deterministically to dim bytes
        buf = bytearray()
        j = 0
        while len(buf) < dim:
            buf.extend(hashlib.sha256(d + j.to_bytes(4, "big")).digest())
            j += 1
        bits = np.frombuffer(bytes(buf[:dim]), dtype=np.uint8)
        rows.append(np.where(bits & 1, 1.0, -1.0))
    return np.stack(rows)


def make_sketch_udf(dim: int, n_bits: int = 16, seed: int = 42):
    """Arrow-vectorized sign-sketch UDF: array<float> → int64 bucket id."""
    H = _hyperplanes(dim, n_bits, seed)

    @F.pandas_udf(T.LongType())
    def sketch(vec: pd.Series) -> pd.Series:  # pragma: no cover (executor)
        M = np.stack(vec.to_numpy())  # (batch, dim)
        signs = (M @ H.T) > 0  # (batch, n_bits)
        weights = (1 << np.arange(n_bits, dtype=np.int64))
        return pd.Series(signs.astype(np.int64) @ weights)

    return sketch


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    multi_probe: bool = False,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's bucket.

    Recall/cost dials: ``n_bits`` (fewer bits → bigger buckets → higher
    recall) and ``multi_probe`` (additionally probe every bucket one
    hyperplane flip away — the standard multi-probe LSH extension). Probing
    explodes the QUERY side only (n_bits+1 probes per query); the corpus —
    the 100 TB side — is never duplicated, and the plan stays one
    broadcast equi-join.
    """
    from pyspark.sql import Window

    sketch = make_sketch_udf(dim, n_bits)
    c = spread(corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))).withColumn(
        "__bucket", sketch(F.col("__cv"))
    ).withColumn("__cn", norm_col(F.col("__cv")))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv")).withColumn(
        "__bucket", sketch(F.col("__qv"))
    ).withColumn("__qn", norm_col(F.col("__qv")))
    if multi_probe:
        probes = F.array(
            F.col("__bucket"),
            *[
                F.col("__bucket").bitwiseXOR(F.lit(1 << b).cast("long"))
                for b in range(n_bits)
            ],
        )
        q = q.withColumn("__bucket", F.explode(probes))
    scored = c.join(F.broadcast(q), "__bucket").withColumn(
        "cosine",
        _scored_cosine(F.col("__qv"), F.col("__cv"), F.col("__qn"),
                       F.col("__cn")),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )



# Nudge for 6-dp roundings of values that can sit EXACTLY on the decimal
# half-boundary (cell means of 1e-6-multiple components; half-squared
# distances between 6-dp grids). At the boundary, the rounding direction
# is decided by ~1e-17 float-summation noise — DuckDB's PARALLEL avg()
# makes that noise nondeterministic run-to-run (observed: ann_topk_pq
# flaking at sf0.001). Adding 1e-9 moves the value off the boundary by
# far more than any summation noise while never crossing a different
# boundary; the SQL oracles add the same constant.
_ROUND_EPS = 1e-9

def ivf_train_centroids(
    corpus: DataFrame,
    n_lists: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_cap: int = 100_000,
    n_iters: int = 5,
) -> np.ndarray:
    """Deterministic bounded Lloyd k-means coarse quantizer.

    Training NEVER touches the full corpus: the train set is the
    ``train_cap`` rows with the smallest portable hash of the id — a
    uniform pseudo-random sample that Spark executes as a distributed
    TakeOrdered (per-partition top-cap, then a driver merge of
    ``min(n, cap)`` rows — at 100 TB this is one narrow map + a bounded
    collect, not a global sort). Init = the ``n_lists`` smallest-hash
    vectors; then ``n_iters`` fixed Lloyd steps with centroids rounded to
    6 decimals after every update.

    Every choice (hash-ranked sample, stable argmin tie-break on cell
    index, per-step rounding) exists so the whole fit is replayable in
    plain SQL — the DuckDB oracle for ``ann_topk_ivf`` re-runs the exact
    same iterations as chained CTEs and must land on identical centroids.
    """
    from hyped_spark.functions.hashing import h64_col

    rows = (
        corpus.select(
            F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
        )
        .withColumn("__h", h64_col(F.col("__id").cast("string"), "md5"))
        .orderBy("__h", "__id")
        .limit(train_cap)
        .select("__v")
        .collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)  # (≤cap, dim)
    C = np.round(X[:n_lists].copy(), 6)
    for _ in range(n_iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)  # ties -> smallest cell index
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):  # empty cell keeps its previous centroid
                C[j] = np.round(members.mean(axis=0) + _ROUND_EPS, 6)
    return C


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_cap: int = 100_000,
    n_iters: int = 5,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    assigns every corpus vector to one of ``n_lists`` cells; a query scores
    only the vectors in its ``n_probe`` nearest cells.

    The 100 TB shape: training is bounded to ``train_cap`` hash-sampled
    rows (see :func:`ivf_train_centroids` — no full-corpus fit); centroids
    are driver-side tiny (n_lists × dim) and broadcast inside the
    assignment UDF; the corpus gains one int cell id and the candidate join
    is a cell equi-join (query side exploded to n_probe rows — the corpus
    is never duplicated). Recall dials: ``n_lists`` down or ``n_probe`` up.
    """
    from pyspark.sql import Window

    C = ivf_train_centroids(
        corpus, n_lists, id_col, vec_col, train_cap=train_cap, n_iters=n_iters
    )

    def make_cells_udf(n: int):
        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def cells(vec: pd.Series) -> pd.Series:  # pragma: no cover (executor)
            M = np.stack(vec.to_numpy())                     # (batch, dim)
            d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            order = np.argsort(d2, axis=1, kind="stable")[:, :n].astype(np.int32)
            return pd.Series(list(order))

        return cells

    c = spread(corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))).withColumn(
        "__cell", make_cells_udf(1)(F.col("__cv"))[0]
    ).withColumn("__cn", norm_col(F.col("__cv")))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv")).withColumn(
        "__cell", F.explode(make_cells_udf(n_probe)(F.col("__qv")))
    ).withColumn("__qn", norm_col(F.col("__qv")))
    scored = c.join(F.broadcast(q), "__cell").withColumn(
        "cosine",
        _scored_cosine(F.col("__qv"), F.col("__cv"), F.col("__qn"),
                       F.col("__cn")),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def quantization_params(
    corpus: DataFrame, dim: int, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over the corpus — one numpy partial
    min/max per partition + a driver reduce over ≤ n_partitions rows.

    Min/max are exact and order-independent, so the params are
    bit-identical to any evaluation order (and across engines). The
    previous form was a single aggregate with 2×dim expressions — exact
    too, but Catalyst planned/optimized 128 aggregate expressions per
    call, ~1 s of driver time per invocation at dim 64 (guide §1.2:
    per-task work includes the plan itself when data is small)."""
    import pyarrow as pa

    def partial(batches):
        lo = np.full(dim, np.inf)
        hi = np.full(dim, -np.inf)
        seen = False
        for b in batches:
            col = b.column(0)
            # zero-copy flat values -> (rows, dim)
            flat = col.flatten().to_numpy(zero_copy_only=False)
            if flat.size != len(col) * dim:
                # a silent reshape under a wrong caller dim (or null
                # elements) would pair unrelated components and emit
                # garbage params — fail loudly instead
                raise ValueError(
                    f"quantization_params: expected {len(col)}x{dim} "
                    f"values, got {flat.size} — vector width does not "
                    f"match dim (or vectors contain nulls)"
                )
            arr = flat.reshape(-1, dim)
            if arr.size:
                seen = True
                np.minimum(lo, arr.min(axis=0), out=lo)
                np.maximum(hi, arr.max(axis=0), out=hi)
        if seen:
            yield pa.RecordBatch.from_pydict(
                {"lo": pa.array([lo.tolist()]), "hi": pa.array([hi.tolist()])}
            )

    rows = (
        corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
        .mapInArrow(partial, "lo array<double>, hi array<double>")
        .collect()  # ≤ one row per partition: metadata-sized collect
    )
    los = np.array([r["lo"] for r in rows])
    his = np.array([r["hi"] for r in rows])
    return (
        [float(x) for x in los.min(axis=0)],
        [float(x) for x in his.max(axis=0)],
    )


def quantize_col(vec: Column, lo: list[float], hi: list[float]) -> Column:
    """array<double> → array<smallint> int8-range scalar quantization
    (q = round((x − lo_d) / scale_d), scale_d = (hi_d − lo_d)/255).

    The 100 TB story: 4× smaller vector storage and shuffle for ANN
    paths; quantize/dequantize are pure native expressions. Every step
    (exact min/max params, one subtraction, one division, one round) is
    bit-reproducible, so the DuckDB oracle lands on identical codes."""
    dim = len(lo)
    scale = [(hi[d] - lo[d]) / 255.0 or 1.0 for d in range(dim)]
    return F.array(*[
        F.round((vec[d] - F.lit(lo[d])) / F.lit(scale[d])).cast("smallint")
        for d in range(dim)
    ])


def dequantize_col(q: Column, lo: list[float], hi: list[float]) -> Column:
    dim = len(lo)
    scale = [(hi[d] - lo[d]) / 255.0 or 1.0 for d in range(dim)]
    return F.array(*[
        (F.lit(lo[d]) + q[d].cast("double") * F.lit(scale[d]))
        for d in range(dim)
    ])


def sq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k cosine over an int8-range scalar-quantized corpus.

    The corpus is MATERIALIZED as ``array<smallint>`` codes before the
    scoring join — those 2-byte codes (1/2 of float32, 1/4 of double) are
    what flows through every downstream exchange; dequantization happens
    at scoring time, after the join, inside codegen. Queries stay
    full-precision. Approximation error shows up only in the cosine
    values/ranking — recall vs exact is tested in
    tests/test_dedup_quality.py, and the storage shape is plan-guarded
    (tests/test_plan_guards.py asserts the pre-join corpus schema carries
    the smallint codes, not doubles)."""
    from pyspark.sql import Window

    lo, hi = quantization_params(corpus, dim, vec_col)
    # codes + the dequantized norm (a scalar) computed pre-join: the join
    # carries (id, smallint codes, 1 double); dequantized VECTORS exist
    # only at scoring time
    c = spread(corpus.select(
        F.col(id_col),
        quantize_col(F.col(vec_col), lo, hi).alias("__cq"),
    )).withColumn("__cn", norm_col(dequantize_col(F.col("__cq"), lo, hi)))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv")) \
               .withColumn("__qn", norm_col(F.col("__qv")))
    scored = c.join(F.broadcast(q)).withColumn(
        "cosine",
        _scored_cosine(F.col("__qv"), dequantize_col(F.col("__cq"), lo, hi),
                       F.col("__qn"), F.col("__cn")),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _make_cells_udf(C: np.ndarray, n: int):
    """Arrow-vectorized n-nearest-centroid assignment (stable argmin —
    ties break to the smaller cell index, same rule as the SQL oracle)."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def cells(vec: pd.Series) -> pd.Series:  # pragma: no cover (executor)
        M = np.stack(vec.to_numpy())
        d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d2, axis=1, kind="stable")[:, :n].astype(np.int32)
        return pd.Series(list(order))

    return cells


def kmeans_cluster(
    corpus: DataFrame,
    n_clusters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_cap: int = 100_000,
    n_iters: int = 5,
    out_col: str = "cluster",
) -> DataFrame:
    """Deterministic k-means document clustering — the IVF coarse
    quantizer (:func:`ivf_train_centroids`) exposed standalone, for topic
    bucketing / mixture construction / per-cluster sampling over an
    embedding column.

    100 TB shape: the fit is bounded (``train_cap`` hash-ranked rows, one
    narrow TakeOrdered collect); assignment is map-only — centroids
    (n_clusters × dim doubles) ride inside the Arrow UDF closure and each
    vector gains one int. Same determinism contract as IVF (stable
    argmin, 6-dp centroid rounding), so the whole clustering replays in
    SQL.
    """
    C = ivf_train_centroids(
        corpus, n_clusters, id_col, vec_col,
        train_cap=train_cap, n_iters=n_iters,
    )
    return spread(corpus).withColumn(
        out_col, _make_cells_udf(C, 1)(F.col(vec_col))[0]
    )


def kmeans_summary(
    clustered: DataFrame,
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Per-cluster size + mean vector norm (one partial+final agg) —
    the compact health view a mixture-construction job logs."""
    return (
        clustered.groupBy(cluster_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(norm_col(F.col(vec_col))), 6).alias("mean_norm"),
        )
        .orderBy(cluster_col)
    )


def build_ivf_sq_index(
    corpus: DataFrame,
    dim: int,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_cap: int = 100_000,
    n_iters: int = 5,
) -> tuple[DataFrame, dict]:
    """Build the persistable IVF-SQ index: ``(index_df, meta)``.

    ``index_df`` is the artifact a 100 TB pipeline WRITES ONCE (e.g. as a
    lake table partitioned/bucketed by ``__cell``) and queries many times:
    (id, __cell int, __cq array<smallint>, __cn double) — ~2 bytes/dim
    plus two scalars per vector, the full-precision embeddings are not in
    it. ``meta`` is the tiny driver-side state to store alongside
    (centroids + quantization params, plain JSON-serializable lists).
    Searching a stored index costs NO training and NO corpus pass — see
    :func:`ivf_sq_search`; the one-shot composition :func:`ivf_sq_topk`
    is exactly build + search."""
    # the coarse k-means fit and the quantization min/max are independent
    # jobs over the same corpus — run them concurrently so the second
    # back-fills the first's straggler tail (guide §2.6)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_c = pool.submit(
            ivf_train_centroids, corpus, n_lists, id_col, vec_col,
            train_cap, n_iters,
        )
        fut_q = pool.submit(quantization_params, corpus, dim, vec_col)
        C = fut_c.result()
        lo, hi = fut_q.result()
    index = spread(
        corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))
    ).select(
        F.col(id_col),
        _make_cells_udf(C, 1)(F.col("__cv"))[0].alias("__cell"),
        quantize_col(F.col("__cv"), lo, hi).alias("__cq"),
    ).withColumn("__cn", norm_col(dequantize_col(F.col("__cq"), lo, hi)))
    meta = {"centroids": C.tolist(), "lo": list(lo), "hi": list(hi)}
    return index, meta


def ivf_sq_search(
    index: DataFrame,
    meta: dict,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k search over a stored IVF-SQ index (from
    :func:`build_ivf_sq_index`, possibly round-tripped through parquet +
    JSON): queries explode to their ``n_probe`` nearest cells, candidates
    come from the cell equi-join against the (codes-only) index, scoring
    dequantizes post-join. The index side is never duplicated."""
    from pyspark.sql import Window

    C = np.asarray(meta["centroids"], dtype=np.float64)
    lo, hi = list(meta["lo"]), list(meta["hi"])
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv")).withColumn(
        "__cell", F.explode(_make_cells_udf(C, n_probe)(F.col("__qv")))
    ).withColumn("__qn", norm_col(F.col("__qv")))
    scored = index.join(F.broadcast(q), "__cell").withColumn(
        "cosine",
        _scored_cosine(F.col("__qv"), dequantize_col(F.col("__cq"), lo, hi),
                       F.col("__qn"), F.col("__cn")),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def ivf_sq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_cap: int = 100_000,
    n_iters: int = 5,
) -> DataFrame:
    """IVF-SQ: the IVF coarse quantizer prunes candidates AND the pruned
    corpus flows as int8-range codes — quantization buys compute (via the
    cell equi-join) and bytes (via the smallint codes) at once, the
    standard FAISS ``IVFx,SQ8`` composition.

    Plan shape: one bounded training job (hash-sampled k-means, see
    :func:`ivf_train_centroids`), one exact min/max aggregate for the
    quantization params, then the corpus is projected ONCE to
    (id, cell, codes) — cell assignment reads the full-precision vector,
    but what crosses the candidate equi-join is the 2-byte codes. Queries
    explode to ``n_probe`` cells; the corpus is never duplicated; scoring
    dequantizes inline post-join. Every step is bit-reproducible, so the
    DuckDB oracle replays the full fit + quantization + scoring in SQL.

    This is the one-shot composition of :func:`build_ivf_sq_index` +
    :func:`ivf_sq_search`; at scale, build once, persist, search many.
    """
    index, meta = build_ivf_sq_index(
        corpus, dim, n_lists=n_lists, id_col=id_col, vec_col=vec_col,
        train_cap=train_cap, n_iters=n_iters,
    )
    return ivf_sq_search(
        index, meta, queries, k=k, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    )


def make_multi_sketch_udf(dim: int, n_bands: int, band_bits: int, seed: int = 42):
    """Arrow-vectorized multi-band sign sketch: array<float> →
    array<long> of ``n_bands`` independent bucket ids (disjoint hyperplane
    sets carved from one seeded matrix)."""
    H = _hyperplanes(dim, n_bands * band_bits, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sketch(vec: pd.Series) -> pd.Series:  # pragma: no cover (executor)
        M = np.stack(vec.to_numpy())  # (batch, dim)
        signs = ((M @ H.T) > 0).reshape(len(M), n_bands, band_bits)
        weights = (1 << np.arange(band_bits, dtype=np.int64))
        return pd.Series(list(signs.astype(np.int64) @ weights))

    return sketch


def embedding_neardup_pairs(
    corpus: DataFrame,
    dim: int,
    min_cosine: float = 0.95,
    n_bands: int = 8,
    band_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Self near-dup pairs (id_a < id_b) with cosine ≥ threshold — banded
    multi-table sign-LSH, the MinHash shape.

    A single wide sketch table is bucket-quadratic at web scale (the r2
    defect: 2^n_bits buckets over 10^9 docs → ~10^10 in-bucket pairs).
    Instead: ``n_bands`` independent narrow sketches; candidate = collide
    in ANY band; each candidate pair verified by exact cosine once. The
    band self-join shuffles only (id, band, bucket) — the vectors are
    joined back per side after `dropDuplicates`, never fanned out per
    band. Recall dials: more bands up, band_bits down (per-band collision
    p = (1 − θ/π)^band_bits, any-band recall = 1 − (1 − p)^n_bands).
    Within-band skew (a dense bucket) is an AQE skew-join case, and
    band_bits bounds the bucket count per band at 2^band_bits.
    """
    sketch = make_multi_sketch_udf(dim, n_bands, band_bits)
    # materialized once: the dataflow references base three times (band
    # build + both verification sides), and each reference otherwise
    # re-executes the scan AND the spread repartition shuffle — the same
    # shared-subtree duplication fixed in minhash_lsh_pairs
    base = spread(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    ).localCheckpoint(eager=True)
    bands = base.select(
        "id", F.posexplode(sketch(F.col("v"))).alias("band", "bucket")
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                     norm_col(F.col("v")).alias("na"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                     norm_col(F.col("v")).alias("nb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", _scored_cosine(F.col("va"), F.col("vb"),
                                             F.col("na"), F.col("nb")))
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )


def _unit_vec_col(col: Column) -> Column:
    """6-dp-rounded unit vector, engine-side (the PQ normalize contract).

    Single-level lambda with the HOF-fold norm ONLY — two tempting
    rewrites are known-bad here and must not come back:
    - let-binding the norm (nested lambda scopes) raises INTERNAL_ERROR
      "Cannot generate code" at Python-UDF extraction;
    - the dim-unrolled norm chain inside this lambda made Janino compile
      a pathological method for the UDF input projection (first reps of
      pq_topk measured 30–80 s of compile before the codegen cache
      warmed; interpreted fold reps are ~2.7 s).
    The norm re-evaluates per element (O(dim²) per row) in both forms;
    this is the price of the extractor limitation, and PQ vectors are
    normalized once per corpus pass."""
    d = col.cast("array<double>")
    return F.transform(d, lambda x: F.round(x / norm_col(d), 6))


def pq_train_codebooks(
    corpus: DataFrame,
    m: int = 4,
    ks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_cap: int = 100_000,
    n_iters: int = 3,
) -> np.ndarray:
    """Product-quantization codebooks: the vector splits into ``m``
    contiguous subspaces, each fitted with its OWN deterministic bounded
    Lloyd k-means (``ks`` centroids) — the FAISS ``PQm`` shape.

    Same replayability contract as :func:`ivf_train_centroids` (one
    hash-ranked bounded sample, stable argmin tie-break, 6-dp rounding per
    step), but over vectors NORMALIZED in-engine first (components rounded
    to 6 dp), because PQ approximates L2 and on unit vectors L2-argmin is
    cosine-argmax: ``cos = 1 - d2/2``. Returns (m, ks, dim//m) float64."""
    from hyped_spark.functions.hashing import h64_col

    # sample FIRST (TakeOrdered on the id hash), normalize the ≤train_cap
    # survivors after the limit — the old projection normalized the whole
    # corpus just to throw away everything past the cap. Engine-side
    # normalize (6-dp unit vectors) keeps the SQL twin's math bit-for-bit.
    sample = (
        corpus.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .withColumn("__h", h64_col(F.col("__id").cast("string"), "md5"))
        .orderBy("__h", "__id")
        .limit(train_cap)
    )
    rows = sample.select(
        _unit_vec_col(F.col("__v")).alias("__vn")
    ).collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sd = dim // m
    books = np.empty((m, ks, sd))
    for j in range(m):
        Xj = X[:, j * sd:(j + 1) * sd]
        C = np.round(Xj[:ks].copy(), 6)
        for _ in range(n_iters):
            d2 = ((Xj[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # ties -> smallest cell
            for c in range(ks):
                members = Xj[assign == c]
                if len(members):  # empty cell keeps its centroid
                    C[c] = np.round(members.mean(axis=0) + _ROUND_EPS, 6)
        books[j] = C
    return books


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    ks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_cap: int = 100_000,
    n_iters: int = 3,
) -> DataFrame:
    """Product-quantization ANN top-k with asymmetric distance (ADC).

    The 100 TB shape: after the bounded fit, every corpus vector
    compresses to ``m`` byte codes (64 float32 dims → 4 bytes, 64×) in one
    Arrow-vectorized pass; each query carries a tiny ``m×ks`` look-up
    table of subspace distances, and candidate scoring is a pure native
    fold over the code array against the broadcast LUT — the full-precision
    corpus is never read again. Returns (query_id, vec_id,
    approx_cosine = 1 - adc/2 on normalized vectors, rank)."""
    from pyspark.sql import Window

    B = pq_train_codebooks(corpus, m, ks, id_col, vec_col,
                           train_cap=train_cap, n_iters=n_iters)
    sd = B.shape[2]

    # normalization happens IN-ENGINE (same sequential fold the SQL twin
    # uses) so the 6-dp-rounded unit vectors are bit-identical in both
    # engines; the UDFs consume them as-is
    def _vn(col: Column) -> Column:
        return _unit_vec_col(col)

    def make_codes_udf():
        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def codes(vec: pd.Series) -> pd.Series:  # pragma: no cover (executor)
            M = np.stack(vec.to_numpy())
            out = np.empty((len(M), B.shape[0]), dtype=np.int32)
            for j in range(B.shape[0]):
                Mj = M[:, j * sd:(j + 1) * sd]
                d2 = ((Mj[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
                out[:, j] = np.argmin(d2, axis=1)
            return pd.Series(list(out))

        return codes

    def make_lut_udf():
        @F.pandas_udf(T.ArrayType(T.DoubleType()))
        def lut(vec: pd.Series) -> pd.Series:  # pragma: no cover (executor)
            M = np.stack(vec.to_numpy())
            out = np.empty((len(M), B.shape[0] * B.shape[1]))
            for j in range(B.shape[0]):
                Mj = M[:, j * sd:(j + 1) * sd]
                d2 = ((Mj[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
                # store HALF the squared distance, rounded: the ADC fold
                # then yields cos = 1 - Σ directly on the 6-dp grid (a /2
                # after rounding would sit exactly on the half-boundary
                # and flip between engines on 1-ulp differences)
                out[:, j * B.shape[1]:(j + 1) * B.shape[1]] = \
                    np.round(d2 / 2.0 + _ROUND_EPS, 6)
            return pd.Series(list(out))

        return lut

    # the normalized vector is computed as its OWN column first: the
    # Python-UDF extractor cannot take a nested-lambda HOF as direct UDF
    # input, and a plain attribute input also guarantees the normalize
    # runs once, in the JVM projection
    c = spread(corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))) \
        .withColumn("__vn", _vn(F.col("__cv"))) \
        .withColumn("__codes", make_codes_udf()(F.col("__vn"))) \
        .drop("__cv", "__vn")
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv")) \
        .withColumn("__vn", _vn(F.col("__qv"))) \
        .withColumn("__lut", make_lut_udf()(F.col("__vn"))) \
        .drop("__qv", "__vn")
    # ADC: left-to-right fold over subspaces — the same association order
    # the SQL oracle's chained additions use
    # ADC fold unrolled over the m subspaces (m is tiny and known):
    # identical left-to-right additions, whole-stage-codegen instead of
    # the interpreted HOF fold
    adc: Column = F.lit(0.0)
    for j in range(m):
        adc = adc + F.element_at(
            F.col("__lut"),
            (F.lit(j * ks) + F.element_at(F.col("__codes"), j + 1)
             + F.lit(1)).cast("int"),
        )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "approx_cosine", F.round(1.0 - adc, 6)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "approx_cosine", "rank")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 8,
    n_probe: int = 2,
    m: int = 4,
    ks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_cap: int = 100_000,
    n_iters: int = 3,
) -> DataFrame:
    """IVF-PQ: the composition FAISS deploys as ``IVFx,PQm`` — a k-means
    coarse quantizer prunes candidates to ``n_probe`` cells, and within
    them scoring runs on PQ byte codes via the broadcast ADC look-up
    table. (Codes quantize the vector itself, not the cell residual — the
    residual refinement is a recall dial this deterministic/replayable
    variant trades away; both sub-fits are the existing bounded trainers.)

    The 100 TB shape combines both parents': corpus state per vector is
    one int cell + ``m`` byte codes (no full-precision reread), the
    candidate join is a cell equi-join (corpus never duplicated), and ADC
    is a native fold — so a query touches ``n_probe/n_lists`` of the
    corpus and reads only codes."""
    from pyspark.sql import Window

    # the coarse and subspace fits are independent bounded sample jobs —
    # overlap them (guide §2.6)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_c = pool.submit(
            ivf_train_centroids, corpus, n_lists, id_col, vec_col,
            train_cap, n_iters,
        )
        fut_b = pool.submit(
            pq_train_codebooks, corpus, m, ks, id_col, vec_col,
            train_cap, n_iters,
        )
        C, B = fut_c.result(), fut_b.result()
    sd = B.shape[2]

    def _vn(col: Column) -> Column:
        return _unit_vec_col(col)

    def make_cells_udf(n: int):
        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def cells(vec: pd.Series) -> pd.Series:  # pragma: no cover (executor)
            M = np.stack(vec.to_numpy())
            d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            order = np.argsort(d2, axis=1, kind="stable")[:, :n].astype(np.int32)
            return pd.Series(list(order))
        return cells

    def make_codes_udf():
        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def codes(vec: pd.Series) -> pd.Series:  # pragma: no cover (executor)
            M = np.stack(vec.to_numpy())
            out = np.empty((len(M), B.shape[0]), dtype=np.int32)
            for j in range(B.shape[0]):
                Mj = M[:, j * sd:(j + 1) * sd]
                d2 = ((Mj[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
                out[:, j] = np.argmin(d2, axis=1)
            return pd.Series(list(out))
        return codes

    def make_lut_udf():
        @F.pandas_udf(T.ArrayType(T.DoubleType()))
        def lut(vec: pd.Series) -> pd.Series:  # pragma: no cover (executor)
            M = np.stack(vec.to_numpy())
            out = np.empty((len(M), B.shape[0] * B.shape[1]))
            for j in range(B.shape[0]):
                Mj = M[:, j * sd:(j + 1) * sd]
                d2 = ((Mj[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
                out[:, j * B.shape[1]:(j + 1) * B.shape[1]] = \
                    np.round(d2 / 2.0 + _ROUND_EPS, 6)
            return pd.Series(list(out))
        return lut

    cv = F.col("__cv").cast("array<double>")
    c = (
        spread(corpus.select(F.col(id_col), F.col(vec_col).alias("__cv")))
        .withColumn("__cell", make_cells_udf(1)(cv)[0])
        .withColumn("__vn", _vn(F.col("__cv")))
        .withColumn("__codes", make_codes_udf()(F.col("__vn")))
        .drop("__cv", "__vn")
    )
    qv = F.col("__qv").cast("array<double>")
    q = (
        queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"))
        .withColumn("__vn", _vn(F.col("__qv")))
        .withColumn("__lut", make_lut_udf()(F.col("__vn")))
        .withColumn("__cell", F.explode(make_cells_udf(n_probe)(qv)))
        .drop("__qv", "__vn")
    )
    # ADC fold unrolled over the m subspaces (m is tiny and known):
    # identical left-to-right additions, whole-stage-codegen instead of
    # the interpreted HOF fold
    adc: Column = F.lit(0.0)
    for j in range(m):
        adc = adc + F.element_at(
            F.col("__lut"),
            (F.lit(j * ks) + F.element_at(F.col("__codes"), j + 1)
             + F.lit(1)).cast("int"),
        )
    scored = c.join(F.broadcast(q), "__cell").withColumn(
        "approx_cosine", F.round(1.0 - adc, 6)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "approx_cosine", "rank")
    )
