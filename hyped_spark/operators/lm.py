"""Corpus language-model quality scoring (CCNet-style perplexity filter).

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM n-gram model; the bucket boundaries then drive keep/drop decisions.
This module implements the same *shape* with a self-contained add-alpha
unigram model fit on the corpus itself (no external model artifacts in the
container): fit once, score every document with a per-token cross-entropy
and perplexity. Swapping in real KenLM scores later only changes the
``logp`` column, not the plumbing.

Scale shape: the fit is one token-count aggregation (map-side combinable)
followed by a TakeOrdered vocabulary head; the count table is
localCheckpoint'ed (it is vocabulary-sized, not corpus-sized) so the
corpus is scanned exactly ONCE for the fit. The two model scalars (total
token count, kept mass) are bounded driver metadata — same contract as the
IVF centroids / SQ quantization params. Scoring joins the exploded corpus
against the BROADCAST vocabulary and re-aggregates per document: the only
shuffle carries (doc_id, partial-sum) rows, never text.

Determinism / oracle: token counts are integers, the vocabulary head is
tie-broken by token, and each token's logp is rounded to 8 dp at fit time
(the same round-at-every-step trick that makes the IVF k-means fit
replayable), so the DuckDB oracle reproduces scores exactly at the output
rounding.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


class UnigramLM:
    """Fitted model: a (token, logp) vocabulary frame + OOV log-prob."""

    def __init__(self, vocab: DataFrame, unk_logp: float,
                 total_tokens: int, n_types: int):
        self.vocab = vocab            # (tok string, logp double)
        self.unk_logp = unk_logp
        self.total_tokens = total_tokens
        self.n_types = n_types        # kept types + 1 (UNK)


def fit_unigram_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 65536,
    alpha: float = 0.5,
) -> UnigramLM:
    """Fit an add-``alpha`` (Lidstone) unigram LM on the corpus.

    ``p(w) = (c_w + alpha) / (total + alpha * (|V| + 1))`` for the top
    ``vocab_size`` tokens (ties broken by token); an out-of-vocabulary
    token scores as an UNSEEN type (``c = 0``, i.e. ``alpha / denom``) —
    deliberately pessimistic, which is exactly what a perplexity quality
    filter wants (pooling the whole tail mass into one UNK type would make
    all-OOV junk score *better* than common text).
    """
    from hyped_spark.functions.hashing import tokens_col

    counts = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
        # vocabulary-sized, not corpus-sized: pin it so the head and the
        # totals below don't each rescan the corpus
        .localCheckpoint(eager=True)
    )
    head = counts.orderBy(F.col("c").desc(), F.col("tok")).limit(vocab_size)

    total = counts.agg(F.sum("c")).first()[0] or 0
    n_kept = head.agg(F.count(F.lit(1))).first()[0] or 0
    n_types = n_kept + 1  # + the unseen-type slot
    denom = total + alpha * n_types

    vocab = head.select(
        "tok",
        F.round(F.log((F.col("c") + F.lit(alpha)) / F.lit(denom)), 8)
         .alias("logp"),
    # vocab is vocabulary-sized: pin IT and release the counts checkpoint
    # now, so repeated fits (e.g. a per-increment --max-ppl gate) don't
    # accumulate block-storage while ContextCleaner dawdles
    ).localCheckpoint(eager=True)
    from hyped_spark.operators.dedup import _release_local_checkpoint
    _release_local_checkpoint(counts)
    unk_logp = round(math.log(alpha / denom), 8)
    return UnigramLM(vocab, unk_logp, total, n_types)


def lm_perplexity(
    df: DataFrame,
    lm: UnigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document cross-entropy and perplexity under ``lm``.

    Output: ``(id_col, n_tokens, cross_entropy, perplexity)`` (4 dp);
    documents with zero tokens are absent (no defined perplexity).
    """
    from hyped_spark.functions.hashing import tokens_col

    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    scored = (
        toks.join(F.broadcast(lm.vocab), "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce("logp", F.lit(lm.unk_logp))).alias("__slp"),
        )
    )
    h = -F.col("__slp") / F.col("n_tokens")
    return scored.select(
        id_col,
        "n_tokens",
        F.round(h, 4).alias("cross_entropy"),
        F.round(F.exp(h), 4).alias("perplexity"),
    )


def ppl_partition(
    scored: DataFrame,
    ppl_col: str = "perplexity",
    fractions: tuple = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple = ("head", "middle", "tail"),
    bucket_col: str = "ppl_bucket",
    round_dp: int = 6,
    exact: bool = True,
) -> DataFrame:
    """CCNet's corpus partition (Wenzek et al. 2020): label every document
    head / middle / tail by perplexity quantiles — LOW perplexity
    (most natural under the LM) is the head. ``len(labels)`` must be
    ``len(fractions) + 1``.

    The cutoffs come from ONE percentile aggregate, rounded to
    ``round_dp`` and broadcast as a 1-row frame; labeling is a native
    CASE — the corpus never shuffles.

    ``exact=True`` (the oracle mode) uses ``F.percentile``: sort-based
    order statistics, deterministic, replayed bit-for-bit by the DuckDB
    ``quantile_cont`` twin — but the final aggregation buffer holds every
    perplexity value in ONE task, an executor memory bomb at billions of
    documents. ``exact=False`` is the scale path: ``approx_percentile``
    at accuracy 1e6 — a mergeable bounded-memory sketch (same per-task
    state whatever the corpus size), still deterministic for a fixed
    input. Cutoffs may differ from exact by ~1/accuracy quantile mass,
    which moves only boundary documents between buckets (asserted within
    tolerance in tests/test_lm.py); use it when the corpus outgrows one
    task's memory — the same twin-mode contract as hash_mode.
    """
    if len(labels) != len(fractions) + 1:
        raise ValueError("need len(labels) == len(fractions) + 1")
    arr = F.array(*[F.lit(float(f)) for f in fractions])
    if exact:
        cut_agg = F.percentile(F.col(ppl_col), arr)
    else:
        cut_agg = F.approx_percentile(
            F.col(ppl_col), arr, F.lit(1_000_000)
        )
    cuts = scored.agg(cut_agg.alias("__c")).select(*[
        F.round(F.element_at("__c", i + 1), round_dp).alias(f"__c{i}")
        for i in range(len(fractions))
    ])
    out = scored.crossJoin(F.broadcast(cuts))
    expr = F.lit(labels[-1])
    for i in range(len(fractions) - 1, -1, -1):
        expr = F.when(
            F.col(ppl_col) <= F.col(f"__c{i}"), F.lit(labels[i])
        ).otherwise(expr)
    return out.withColumn(bucket_col, expr).drop(
        *[f"__c{i}" for i in range(len(fractions))]
    )


def ppl_partition_sql(
    scored_sql: str,
    ppl_expr: str = "perplexity",
    fractions: tuple = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple = ("head", "middle", "tail"),
    bucket_col: str = "ppl_bucket",
    round_dp: int = 6,
) -> str:
    """DuckDB twin of :func:`ppl_partition`: wraps a scored subquery (may
    itself start with WITH — nested CTEs are scoped) with quantile_cont
    cutoffs and the identical CASE ladder. Returns
    ``SELECT *, bucket FROM ...`` over the scored columns."""
    cuts = ", ".join(
        f"round(quantile_cont({ppl_expr}, {f!r}), {round_dp}) AS __c{i}"
        for i, f in enumerate(fractions)
    )
    case = f"'{labels[-1]}'"
    for i in range(len(fractions) - 1, -1, -1):
        case = (f"CASE WHEN {ppl_expr} <= __c{i} THEN '{labels[i]}' "
                f"ELSE {case} END")
    return f"""
        WITH __base AS ({scored_sql}),
        __cuts AS (SELECT {cuts} FROM __base)
        SELECT __base.*, {case} AS {bucket_col} FROM __base, __cuts
    """
