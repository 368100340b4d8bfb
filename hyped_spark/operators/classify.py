"""Model-inference operators: linear text classifiers over hashed features.

The last mile of every web-curation pipeline is a learned quality gate —
CCNet's fastText LM filter, FineWeb-Edu's educational-quality classifier,
toxicity/NSFW filters. The model itself is trained elsewhere and is tiny
(a weight vector); what has to scale is INFERENCE over 100 TB of text.

:func:`linear_text_score` runs a hashed bag-of-words linear model (the
fastText-without-subwords shape: tokens → feature buckets via the hashing
trick, mean-pooled, dot with a weight vector, sigmoid) as a fully MAP-ONLY
plan: the weight vector rides in a single broadcast row (same pattern as
BM25's corpus-stats row), the per-document score is one native
``aggregate`` fold over the token array — no shuffle, no UDF, no per-row
Python. A 2M-bucket float vector is 16 MB: trivially broadcastable, never
a join.

``hash_mode="md5"`` makes scoring bit-replayable in DuckDB (the oracle
rebuilds the same weights and folds the same list), which is also how a
real deployment would pin model/engine version skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hyped_spark.functions.hashing import h64_col, tokens_col


def linear_text_score(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    bias: float = 0.0,
    hash_mode: str = "xxhash64",
    out_col: str = "score",
) -> DataFrame:
    """Score each row with a hashed-BoW linear classifier.

    ``score = sigmoid(bias + mean_t(weights[h64(token_t) % dim]))`` —
    mean pooling over the document's tokens; an empty document scores
    ``sigmoid(bias)``. ``weights`` is the trained model (driver-side
    artifact, like IVF centroids); its length fixes the feature dimension.

    Plan shape: broadcast 1-row weights frame × corpus (BroadcastNestedLoop
    over exactly one row = map-side append of the array), then a native
    fold — zero exchanges, whole plan streams.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    dim = len(weights)
    spark = df.sparkSession
    wrow = spark.createDataFrame(
        [([float(w) for w in weights],)], "__w array<double>"
    )

    def _step(acc: Column, t: Column) -> Column:
        idx = F.pmod(h64_col(t, hash_mode), F.lit(dim)) + 1
        return acc + F.element_at(F.col("__w"), idx.cast("int"))

    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    pooled = F.when(
        n > 0, F.aggregate(toks, F.lit(0.0), _step) / n
    ).otherwise(F.lit(0.0))
    z = F.lit(float(bias)) + pooled
    return (
        df.crossJoin(F.broadcast(wrow))
        .withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
        .drop("__w")
    )


def linear_text_score_sql(
    weights_expr: str,
    dim: int,
    text_expr: str = "text",
    bias: float = 0.0,
) -> str:
    """DuckDB twin of the :func:`linear_text_score` scoring expression
    (md5 hash mode) — a bare scalar expression, alias it at the call site.
    ``weights_expr`` must evaluate to a 1-indexed DOUBLE[] of length
    ``dim`` — typically a scalar subquery over a CTE. Token extraction
    matches :func:`hyped_spark.functions.hashing.tokens_col`."""
    from hyped_spark.functions.hashing import h64_sql

    toks = (
        f"list_filter(regexp_split_to_array(lower({text_expr}), "
        f"'[^\\p{{L}}\\p{{N}}]+'), t -> len(t) > 0)"
    )
    h = h64_sql("t")
    pooled = (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"list_sum([({weights_expr})[(({h}) % {dim}) + 1] FOR t IN {toks}])"
        f" / len({toks}) ELSE 0.0 END"
    )
    return f"1.0 / (1.0 + exp(-({bias!r} + {pooled})))"
