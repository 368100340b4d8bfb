"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023, arXiv:2302.03169): select raw web documents whose hashed-n-gram
distribution matches a small target corpus, by importance weights under
two bag-of-hashed-ngrams unigram models.

The published recipe, re-expressed Spark-first:

1. **Featurize** every document as a bag of hashed unigram+bigram buckets
   (the hashing trick, ``buckets`` ≈ 10k in the paper) —
   :func:`hashed_gram_buckets_col`, a pure native-HOF column (tokenize →
   hash → pmod), no UDF, no shuffle.
2. **Fit** two add-``alpha`` categorical distributions over the buckets —
   target corpus p and raw corpus q — :func:`fit_hashed_gram_dist`: one
   explode + one ``buckets``-group aggregate per corpus (map-side partial
   combine; at most ``buckets`` rows ever reach the reduce side or the
   driver). The fitted model is a ``buckets``-length list of 8-dp-rounded
   log-probs — a tiny driver-side artifact, exactly like IVF centroids or
   classifier weights.
3. **Weigh** each raw document: ``log w(x) = Σ_g λ[bucket(g)]`` with
   ``λ = log p − log q`` — :func:`dsir_logweight`, a MAP-ONLY plan: λ
   rides in a single broadcast row (80 KB at 10k buckets) and the per-doc
   sum is one native ``aggregate`` fold. The 100 TB corpus never
   shuffles.
4. **Resample** k documents ∝ w without replacement via the Gumbel
   top-k trick — :func:`dsir_resample`: key = log w + Gumbel noise,
   take the k largest. The noise is derived from a portable md5 hash of
   (seed, id), so the "random" sample is deterministic, reproducible
   across engines, and bit-replayable by the DuckDB oracle. Selection is
   ``orderBy(key).limit(k)`` = TakeOrdered — no global sort.

Reference parity: the reference engine (jjbuschhoff/hyped) has no data
selection op; this extends the curation suite (see operators/curation.py)
with the standard LLM-pretraining selection method, per the build brief.

Scale notes (100 TB): fit cost is two corpus scans with map-side-combined
``buckets``-ary aggregation; weighting is embarrassingly parallel; the
only per-run driver state is O(buckets) floats. Skew-free by
construction (bucket ids are hash-uniform).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hyped_spark.functions.hashing import h64_col, h64_sql, tokens_col

_GUMBEL_DEN = float((1 << 60) + 2)  # md5-60bit hash → u strictly in (0,1)


def hashed_gram_buckets_col(
    text: Column,
    buckets: int,
    n_max: int = 2,
    hash_mode: str = "xxhash64",
) -> Column:
    """Bag of hashed n-gram buckets (repeats kept) as ``array<int>``.

    Unigrams hash the token string; bigrams hash ``"t1 t2"`` (the joined
    string, so md5 mode stays DuckDB-portable). ``n_max`` ∈ {1, 2}.
    """
    if n_max not in (1, 2):
        raise ValueError("n_max must be 1 or 2")
    if buckets <= 0:
        raise ValueError("buckets must be positive")
    b = F.lit(buckets)

    def _bucket(s: Column) -> Column:
        return F.pmod(h64_col(s, hash_mode), b).cast("int")

    if n_max == 1:
        return F.transform(tokens_col(text), _bucket)

    # bind the token array once per row (let_col): the body references it
    # three times, and without the binding the tokenizer regex re-ran per
    # reference (guide §1.2 per-task work)
    from hyped_spark.functions.hashing import let_col

    def body(toks):
        uni = F.transform(toks, _bucket)
        # zip_with pads the shorter side with NULL; concat(NULL) → NULL, so
        # the trailing partial pair filters out. concat_ws would SKIP the
        # null and emit a bogus unigram — don't swap it in.
        pairs = F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, c: F.concat(a, F.lit(" "), c),
        )
        bi = F.transform(
            F.filter(pairs, lambda s: s.isNotNull()), _bucket
        )
        return F.concat(uni, bi)

    return let_col(tokens_col(text), body)


def hashed_gram_buckets_sql(
    text_expr: str, buckets: int, n_max: int = 2
) -> str:
    """DuckDB twin of :func:`hashed_gram_buckets_col` (md5 mode).

    Tokenization matches ``hashing.tokens_col``; DuckDB lists are
    1-indexed and ``generate_series(1, 0)`` is empty, so single-token
    documents produce no bigrams, same as the zip_with path.
    """
    toks = (
        f"list_filter(regexp_split_to_array(lower({text_expr}), "
        f"'[^\\p{{L}}\\p{{N}}]+'), t -> len(t) > 0)"
    )
    uni = f"[{h64_sql('t')} % {buckets} FOR t IN {toks}]"
    if n_max == 1:
        return uni
    pair = f"({toks})[i] || ' ' || ({toks})[i + 1]"
    bi = (
        f"[{h64_sql(pair)} % {buckets}"
        f" FOR i IN generate_series(1, len({toks}) - 1)]"
    )
    return f"({uni} || {bi})"


def fit_hashed_gram_dist(
    df: DataFrame,
    text_col: str = "text",
    buckets: int = 10_000,
    n_max: int = 2,
    alpha: float = 1.0,
    hash_mode: str = "xxhash64",
) -> list[float]:
    """Fit an add-``alpha`` categorical distribution over hashed n-gram
    buckets; returns ``buckets`` log-probs, each rounded to 8 dp (the
    lm.py discipline: rounding at fit time is what lets the DuckDB oracle
    replay the fit bit-for-bit; ln of a rational never sits on the
    decimal grid, so no boundary nudge is needed).
    """
    grams = hashed_gram_buckets_col(
        F.col(text_col), buckets, n_max=n_max, hash_mode=hash_mode
    )
    rows = (
        df.select(F.explode(grams).alias("__b"))
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("c"))
        # hashed-gram bucket counts: <= buckets rows (metadata-sized)
        .collect()
    )
    counts = {r["__b"]: r["c"] for r in rows}
    total = sum(counts.values())
    denom = total + alpha * buckets
    return [
        round(math.log((counts.get(i, 0) + alpha) / denom), 8)
        for i in range(buckets)
    ]


def fit_hashed_gram_dist_sql(
    corpus_sql: str,
    buckets: int,
    n_max: int = 2,
    alpha: float = 1.0,
    text_expr: str = "text",
) -> str:
    """DuckDB replay of :func:`fit_hashed_gram_dist` as a scalar-subquery
    SELECT producing one row ``(arr)`` — the ordered ``buckets``-length
    log-prob list. Compose inside a WITH clause."""
    grams = hashed_gram_buckets_sql(text_expr, buckets, n_max=n_max)
    # the total is the sum of the bucket counts already computed — a
    # second tokenize+hash pass over the corpus would double the oracle's
    # dominant cost. The WITH is nested (scoped to this subquery), so two
    # fits composing in one outer query don't collide on __gc/__gt.
    return f"""
        WITH __gc AS (
            SELECT b, count(*) AS c FROM (
                SELECT unnest({grams}) AS b FROM ({corpus_sql})
            ) GROUP BY b
        ),
        __gt AS (SELECT coalesce(sum(c), 0) AS total FROM __gc)
        SELECT list(
            round(ln((coalesce(c.c, 0) + {alpha!r})
                     / (ct.total + {alpha!r} * {buckets})), 8)
            ORDER BY g.b) AS arr
        FROM generate_series(0, {buckets - 1}) g(b)
        LEFT JOIN __gc c ON g.b = c.b
        CROSS JOIN __gt ct
    """


def dsir_log_ratio(
    logp_target: list[float], logp_raw: list[float]
) -> list[float]:
    """λ = log p − log q, elementwise. Both inputs are 8-dp-rounded, so
    the difference is engine-stable without further rounding."""
    if len(logp_target) != len(logp_raw):
        raise ValueError("distributions have different bucket counts")
    return [t - r for t, r in zip(logp_target, logp_raw)]


def dsir_logweight(
    df: DataFrame,
    log_ratio: list[float],
    text_col: str = "text",
    n_max: int = 2,
    hash_mode: str = "xxhash64",
    out_col: str = "logw",
) -> DataFrame:
    """Per-document importance log-weight ``Σ_g λ[bucket(g)]``.

    MAP-ONLY: λ is one broadcast row (BroadcastNestedLoop over exactly one
    row = map-side array append), the sum is a native left fold over the
    gram array — zero exchanges, zero Python. An empty document scores
    0.0 (weight 1: no evidence either way).
    """
    buckets = len(log_ratio)
    spark = df.sparkSession
    lrow = spark.createDataFrame(
        [([float(x) for x in log_ratio],)], "__lam array<double>"
    )
    grams = hashed_gram_buckets_col(
        F.col(text_col), buckets, n_max=n_max, hash_mode=hash_mode
    )
    logw = F.aggregate(
        grams,
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(F.col("__lam"), b + 1),
    )
    return (
        df.crossJoin(F.broadcast(lrow))
        .withColumn(out_col, logw)
        .drop("__lam")
    )


def dsir_logweight_sql(
    lam_expr: str,
    buckets: int,
    text_expr: str = "text",
    n_max: int = 2,
) -> str:
    """DuckDB twin of the :func:`dsir_logweight` scoring expression (md5
    mode) — a bare scalar; ``lam_expr`` must reference a cross-joined
    1-row λ list (lambdas can't hold subqueries). ``list_sum([])`` is
    NULL in DuckDB where the Spark fold init gives 0.0 — coalesced."""
    grams = hashed_gram_buckets_sql(text_expr, buckets, n_max=n_max)
    return (
        f"coalesce(list_sum([({lam_expr})[b + 1] FOR b IN {grams}]), 0.0)"
    )


def gumbel_key_col(
    id_col: Column, logw_col: Column, seed: int = 42
) -> Column:
    """Gumbel-top-k sampling key ``log w + (−ln(−ln u))`` with u derived
    from a portable md5 hash of (seed, id) — deterministic across runs,
    partitionings, and engines. ``P(select) ∝ exp(log w)`` without
    replacement (Gumbel-max trick)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(
                "|", F.lit("dsir"), F.lit(str(seed)),
                id_col.cast("string"),
            )),
            1, 15,
        ),
        16, 10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(_GUMBEL_DEN)
    return logw_col + -F.log(-F.log(u))


def gumbel_key_sql(id_expr: str, logw_expr: str, seed: int = 42) -> str:
    """DuckDB twin of :func:`gumbel_key_col`."""
    h = h64_sql(f"'dsir|{seed}|' || CAST({id_expr} AS VARCHAR)")
    return (
        f"({logw_expr}) + -ln(-ln(({h} + 1.0) / {_GUMBEL_DEN!r}))"
    )


def dsir_resample(
    df: DataFrame,
    log_ratio: list[float],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    n_max: int = 2,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Select ``k`` documents without replacement with probability ∝ the
    DSIR importance weight: weigh (map-only), key with deterministic
    Gumbel noise, take the k largest (TakeOrdered — no global sort, the
    driver receives k rows not the corpus). Returns the selected rows
    with their ``logw``; the sampling key is internal."""
    scored = dsir_logweight(
        df, log_ratio, text_col=text_col, n_max=n_max, hash_mode=hash_mode
    )
    keyed = scored.withColumn(
        "__gk", gumbel_key_col(F.col(id_col), F.col("logw"), seed=seed)
    )
    return (
        keyed.orderBy(F.col("__gk").desc(), F.col(id_col))
        .limit(k)
        .drop("__gk")
    )


def dsir_select(
    target_df: DataFrame,
    raw_df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    n_max: int = 2,
    alpha: float = 1.0,
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """End-to-end DSIR: fit p on ``target_df`` and q on ``raw_df``, then
    Gumbel-resample ``k`` rows of ``raw_df`` ∝ exp(log p − log q).

    The two fits are INDEPENDENT corpus scans, so they run as concurrent
    Spark jobs from a 2-thread pool (guide §2.6 "overlap independent
    jobs"): the second scan back-fills executors freed by the first's
    stragglers instead of waiting for the full barrier. Each fit is
    deterministic (a bucket-count aggregate), so concurrency cannot
    change the fitted distributions."""
    from concurrent.futures import ThreadPoolExecutor

    def _fit(frame: DataFrame) -> list[float]:
        return fit_hashed_gram_dist(
            frame, text_col=text_col, buckets=buckets, n_max=n_max,
            alpha=alpha, hash_mode=hash_mode,
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_t = pool.submit(_fit, target_df)
        fut_q = pool.submit(_fit, raw_df)
        logp_t, logp_q = fut_t.result(), fut_q.result()
    return dsir_resample(
        raw_df, dsir_log_ratio(logp_t, logp_q), k, id_col=id_col,
        text_col=text_col, seed=seed, n_max=n_max, hash_mode=hash_mode,
    )
