"""Cross-document duplicated-substring span detection.

The exact-substring dedup signal from Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better"): find runs of >= n
consecutive tokens that occur verbatim in more than one document, so a
pipeline can cut the repeated boilerplate out of (or down-weight) each
document instead of dropping whole near-duplicates. The paper builds a
corpus-wide suffix array; that structure is inherently sequential and
memory-resident, so the Spark-native shape used here is the standard
n-gram-anchored equivalent (as in the text-dedup family of pipelines):

1. hash every n-token window of every document (fold-hash kernel — no
   gram strings materialized on the scale path),
2. find window hashes that occur in >= 2 DISTINCT documents — one
   map-side-combinable aggregate on the 8-byte hash; "distinct docs"
   needs only ``min(id) != max(id)``, not a countDistinct,
3. join positions back on the hash and merge overlapping/adjacent
   windows per document into maximal spans (lag + running-sum segment
   trick, ROWS frame).

Every duplicated run of length L >= n is covered exactly by its L-n+1
duplicated windows, and merging those windows reconstructs the maximal
span — so the output equals the suffix-array answer for runs >= n.

Scale: only ``(id, pos, hash)`` triples ever shuffle — 24 bytes per
token — never text; the hash aggregate is map-side combinable; the
per-document window is bounded by document length. No cartesian
products, no driver-side collection.

Reference parity: the reference has no substring-dedup processor; this is
a training-pipeline extension (SURVEY.md §2 extensions table), a sibling
of :mod:`hyped_spark.operators.dedup`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hyped_spark.functions.hashing import positional_gram_hashes_col, tokens_col
from hyped_spark.operators.common import spread


def duplicate_ngram_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Maximal cross-document duplicated token spans.

    Returns one row per maximal duplicated span::

        (id_col, span_start, span_end, span_tokens)

    in 0-based token coordinates over ``tokens_col(text)`` (half-open:
    the span covers tokens ``[span_start, span_end)``); a span is emitted
    for EVERY document containing the duplicated run, including the
    "first" occurrence — the caller chooses a keep rule. Documents shorter
    than ``n`` tokens never match. Two distinct duplicated runs in one
    document merge into one row iff they overlap or are exactly adjacent
    (anchor-window starts within ``n`` of each other) — the same
    granularity the suffix-array method yields after its own span merge.

    ``hash_mode='xxhash64'`` (default) is the scale path; results differ
    from literal gram-string comparison only on a 2^-64 hash collision,
    so a string-gram SQL oracle checks it directly. ``'md5'`` replays
    bit-identically in DuckDB.
    """
    # narrow projection FIRST, then spread: the gram fold is CPU-heavy and
    # small-sf parquet is single-row-group (single-task scans); spread is a
    # guarded no-op once the scan already has enough partitions
    base = spread(
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
    ).select("__id", tokens_col(F.col("__text")).alias("__toks"))
    pos_grams = base.select(
        "__id",
        F.posexplode(positional_gram_hashes_col(F.col("__toks"), n, hash_mode))
         .alias("__pos", "__gh"),
    )
    # window hashes seen in >= 2 distinct documents: min/max id differing is
    # exactly "more than one distinct id", without a countDistinct shuffle
    cross_doc = (
        pos_grams.groupBy("__gh")
        .agg(F.min("__id").alias("__mn"), F.max("__id").alias("__mx"))
        .where(F.col("__mn") != F.col("__mx"))
        .select("__gh")
    )
    dup_pos = pos_grams.join(cross_doc, "__gh").select("__id", "__pos")
    # merge windows [pos, pos+n): same span while the next start is within
    # n of the previous (overlap or touch). Explicit ROWS frame: positions
    # are unique per doc by construction, but RANGE peers would still be
    # wrong if that invariant ever broke.
    w = Window.partitionBy("__id").orderBy("__pos")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans = (
        dup_pos.withColumn(
            "__new_seg",
            F.when(
                F.col("__pos") - F.lag("__pos").over(w) > n, F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn("__seg", F.sum("__new_seg").over(wsum))
        .groupBy("__id", "__seg")
        .agg(
            F.min("__pos").alias("span_start"),
            (F.max("__pos") + n).alias("span_end"),
        )
        .select(
            F.col("__id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )
    return spans


def cut_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    hash_mode: str = "xxhash64",
    out_col: str = "clean_text",
) -> DataFrame:
    """Remove cross-document duplicated runs from every document.

    The remediation half of substring dedup: tokens covered by any span
    from :func:`duplicate_ngram_spans` are dropped and the survivors are
    re-joined with single spaces. The cut operates on the NORMALIZED token
    stream (``tokens_col``: lowercased, punctuation-split) — i.e. on the
    exact token stream a tokenizer-bound training pipeline consumes — not
    on the raw string, whose casing/punctuation cannot be reassembled
    around a cut anyway. Every input row survives (clean docs pass through
    with normalized text); output is ``(id_col, out_col)``.

    This cuts EVERY occurrence of a duplicated run (boilerplate removal —
    the common web-text case); to instead keep one canonical occurrence,
    filter the span frame by a keep rule before cutting. Plan shape: the
    span frame collapses to one ``collect_list`` row per affected doc and
    joins back on id; token filtering is a native higher-order function —
    no Python, no extra payload shuffle.
    """
    spans = duplicate_ngram_spans(df, id_col, text_col, n, hash_mode)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = df.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")
    )
    kept = F.filter(
        F.col("__toks"),
        lambda t, i: ~F.exists(
            F.col("__spans"),
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        ),
    )
    return (
        toks.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.when(F.col("__spans").isNull(), F.array_join("__toks", " "))
             .otherwise(F.array_join(kept, " "))
             .alias(out_col),
        )
    )


def duplicate_token_frac(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-document fraction of tokens covered by cross-document duplicated
    spans (0.0 for documents with none) — the doc-level filter signal
    derived from :func:`duplicate_ngram_spans`. Output:
    ``(id_col, n_tokens, dup_tokens, dup_token_frac)`` for every input row.
    """
    spans = duplicate_ngram_spans(df, id_col, text_col, n, hash_mode)
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_tokens").alias("dup_tokens")
    )
    lens = df.select(
        F.col(id_col), F.size(tokens_col(F.col(text_col))).alias("n_tokens")
    )
    return (
        lens.join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("dup_token_frac"),
        )
    )
