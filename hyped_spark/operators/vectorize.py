"""Hashed TF-IDF document vectorization — the classic sparse featurizer
(scikit-learn's HashingVectorizer + TfidfTransformer shape) as a
distributed pipeline stage feeding clustering (kmeans_cluster), ANN, or a
linear classifier.

Shape at 100 TB:

- token → feature bucket via the hashing trick (no vocabulary state, the
  property that makes the op embarrassingly shardable);
- per-(doc, bucket) term frequencies: ONE exchange of (id, bucket) pairs
  (map-side combined — the payload never shuffles);
- document frequencies / IDF: a ``buckets``-bounded aggregate, joined
  back as a broadcast (≤ buckets rows regardless of corpus size);
- per-doc sparse vectors: one exchange on id, emitting aligned
  bucket-sorted ``idx``/``val`` arrays (the standard CSR row pair).

IDF = ln((N + 1) / (df + 1)) + 1 (the smoothed scikit-learn variant),
rounded to 8 dp at fit (lm.py discipline) so the whole vectorization is
bit-replayable in DuckDB in md5 hash mode; tf·idf values round to 6 dp.
L2 normalization (optional) folds the SORTED val array sequentially in
both engines, so the norm is bit-identical too.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hyped_spark.functions.hashing import h64_col, h64_sql, tokens_col


def _hashed_tf(
    df: DataFrame, id_col: str, text_col: str, buckets: int,
    hash_mode: str,
) -> DataFrame:
    toks = tokens_col(F.col(text_col))
    return (
        df.select(F.col(id_col), F.explode(toks).alias("__t"))
        .select(
            id_col,
            F.pmod(h64_col(F.col("__t"), hash_mode), F.lit(buckets))
            .cast("int").alias("__b"),
        )
        .groupBy(id_col, "__b")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )


def hashed_df_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1 << 18,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-bucket document-frequency counts ``(__b, __df)`` — the
    corpus-level IDF state. ADDITIVE over disjoint document sets (each
    doc contributes ≤1 per bucket), so a persisted counts table updates
    with :func:`merge_df_counts` per ingested batch and the corpus is
    never re-tokenized — the CDC-composable featurization state, exactly
    the ``build_minhash_index``/``incremental_minhash_dedup`` contract."""
    return (
        _hashed_tf(df, id_col, text_col, buckets, hash_mode)
        .groupBy("__b").agg(F.count(F.lit(1)).alias("__df"))
    )


def merge_df_counts(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold a delta's DF counts into the stored state (one bounded agg —
    at most ``buckets`` rows per side)."""
    return (
        a.unionByName(b)
        .groupBy("__b").agg(F.sum("__df").alias("__df"))
    )


def tfidf_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1 << 18,
    hash_mode: str = "xxhash64",
    normalize: bool = False,
    idf_counts: DataFrame | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """(id, idx array<int>, val array<double>) — bucket-sorted sparse
    hashed TF-IDF rows. Empty documents yield empty arrays.

    Pass ``idf_counts`` (a :func:`hashed_df_counts` frame, possibly
    merged across many ingested batches) + ``n_docs`` to score a DELTA
    against corpus-level statistics without rescanning the corpus — the
    incremental path; omitted, both are computed from ``df`` (batch
    mode). Batch and incremental agree exactly when the counts cover the
    same corpus (test_curation pins this equivalence)."""
    if (idf_counts is None) != (n_docs is None):
        raise ValueError("pass idf_counts and n_docs together")
    tf = _hashed_tf(df, id_col, text_col, buckets, hash_mode)
    if idf_counts is None:
        n_docs = df.count()  # 1-row metadata (corpus size in the IDF)
        idf_counts = tf.groupBy("__b").agg(
            F.count(F.lit(1)).alias("__df"))
    idf = idf_counts.select(
        "__b",
        F.round(
            F.log((F.lit(float(n_docs + 1))) / (F.col("__df") + 1))
            + 1.0,
            8,
        ).alias("__idf"),
    )
    # LEFT join: a delta bucket the stored corpus stats never saw (df=0)
    # must get the smoothed unseen-bucket IDF, not vanish from the vector
    # (only reachable in incremental mode; batch counts cover every
    # bucket by construction)
    unseen_idf = round(math.log(n_docs + 1.0) + 1.0, 8)
    pairs = (
        tf.join(F.broadcast(idf), "__b", "left")
        .select(
            id_col,
            F.struct(
                F.col("__b").alias("b"),
                F.round(
                    F.col("__tf")
                    * F.coalesce("__idf", F.lit(unseen_idf)),
                    6,
                ).alias("v"),
            ).alias("__p"),
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("__p")).alias("__ps"))
    )
    out = pairs.select(
        id_col,
        F.transform("__ps", lambda p: p["b"]).alias("idx"),
        F.transform("__ps", lambda p: p["v"]).alias("val"),
    )
    # documents with zero tokens never reach the explode — join them back
    # with empty arrays so the op is total
    base = df.select(id_col)
    out = (
        base.join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("idx", F.array().cast("array<int>")).alias("idx"),
            F.coalesce("val", F.array().cast("array<double>")).alias("val"),
        )
    )
    if normalize:
        norm = F.sqrt(
            F.aggregate(
                "val", F.lit(0.0), lambda acc, v: acc + v * v
            )
        )
        out = out.withColumn(
            "val",
            F.when(
                norm > 0,
                F.transform("val", lambda v: F.round(v / norm, 6)),
            ).otherwise(F.col("val")),
        )
    return out


def tfidf_vectors_sql(
    table: str,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    buckets: int = 1 << 18,
    normalize: bool = False,
) -> str:
    """DuckDB twin of :func:`tfidf_vectors` (md5 mode)."""
    toks = (
        f"list_filter(regexp_split_to_array(lower({text_expr}), "
        f"'[^\\p{{L}}\\p{{N}}]+'), t -> len(t) > 0)"
    )
    h = h64_sql("tok")
    val = "round(__tf * __idf, 6)"
    vals = "list(p.v ORDER BY p.b)"
    if normalize:
        vals = (
            "CASE WHEN sqrt(list_sum([x * x FOR x IN "
            "list(p.v ORDER BY p.b)])) > 0 THEN "
            "[round(x / sqrt(list_sum([y * y FOR y IN "
            "list(p.v ORDER BY p.b)])), 6) FOR x IN "
            "list(p.v ORDER BY p.b)] ELSE list(p.v ORDER BY p.b) END"
        )
    return f"""
        WITH n AS (SELECT count(*) AS nd FROM {table}),
        tf AS (
            SELECT {id_expr} AS id, ({h}) % {buckets} AS b,
                   CAST(count(*) AS BIGINT) AS __tf
            FROM (SELECT {id_expr}, unnest({toks}) AS tok FROM {table})
            GROUP BY 1, 2
        ),
        idf AS (
            SELECT b, round(ln((n.nd + 1.0) / (count(*) + 1)) + 1.0, 8)
                   AS __idf
            FROM tf, n GROUP BY b, n.nd
        ),
        pairs AS (
            SELECT tf.id,
                   struct_pack(b := CAST(tf.b AS INT), v := {val}) AS p
            FROM tf JOIN idf USING (b)
        ),
        vecs AS (
            SELECT id, list(p.b ORDER BY p.b) AS idx, {vals} AS val
            FROM pairs GROUP BY id
        )
        SELECT d.{id_expr} AS id,
               coalesce(v.idx, []) AS idx,
               coalesce(v.val, []) AS val
        FROM {table} d LEFT JOIN vecs v ON d.{id_expr} = v.id
    """
