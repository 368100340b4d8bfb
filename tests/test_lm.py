"""Add-alpha unigram LM fit + per-document perplexity scoring."""

from __future__ import annotations

import math
from collections import Counter


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat"),
    (3, "zebra quagga okapi"),   # rare tokens -> partly OOV at small V
]


def _expected(vocab_size, alpha=0.5):
    toks = {i: t.split() for i, t in DOCS}
    counts = Counter(t for v in toks.values() for t in v)
    head = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    total = sum(counts.values())
    kept = dict(head)
    n_types = len(head) + 1
    denom = total + alpha * n_types
    logp = {t: round(math.log((c + alpha) / denom), 8) for t, c in kept.items()}
    unk = round(math.log(alpha / denom), 8)
    out = {}
    for i, tk in toks.items():
        slp = sum(logp.get(t, unk) for t in tk)
        h = -slp / len(tk)
        out[i] = (len(tk), round(h, 4), round(math.exp(h), 4))
    return out


def test_lm_scores_match_hand_computation(spark):
    from hyped_spark.operators.lm import fit_unigram_lm, lm_perplexity

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for v in (4, 100):  # with real OOV mass, and with full coverage
        lm = fit_unigram_lm(df, vocab_size=v)
        got = {
            r.doc_id: (r.n_tokens, r.cross_entropy, r.perplexity)
            for r in lm_perplexity(df, lm).collect()
        }
        assert got == _expected(v), (v, got)


def test_lm_probability_mass_is_sane(spark):
    from hyped_spark.operators.lm import fit_unigram_lm

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    # full vocabulary coverage: kept mass + one unseen slot sums to 1
    lm = fit_unigram_lm(df, vocab_size=100, alpha=0.5)
    mass = sum(math.exp(r.logp) for r in lm.vocab.collect())
    assert abs(mass + math.exp(lm.unk_logp) - 1.0) < 1e-6, mass
    # truncated vocabulary: the unseen-type estimate is pessimistic — the
    # OOV slot gets LESS probability than any kept token, never the pooled
    # tail mass
    lm4 = fit_unigram_lm(df, vocab_size=4, alpha=0.5)
    min_kept = min(r.logp for r in lm4.vocab.collect())
    assert lm4.unk_logp < min_kept
    assert lm4.n_types == 5


def test_lm_rare_docs_have_higher_perplexity(spark):
    """The quality-filter premise: in-distribution text scores lower
    perplexity than rare/OOV text."""
    from hyped_spark.operators.lm import fit_unigram_lm, lm_perplexity

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    lm = fit_unigram_lm(df, vocab_size=4)
    ppl = {r.doc_id: r.perplexity for r in lm_perplexity(df, lm).collect()}
    assert ppl[3] > ppl[1] and ppl[3] > ppl[2]


def test_lm_scoring_plan_broadcasts_vocab(spark):
    from hyped_spark.operators.lm import fit_unigram_lm, lm_perplexity

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    lm = fit_unigram_lm(df, vocab_size=4)
    plan = lm_perplexity(df, lm)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lm_score_stage_roundtrip(spark):
    """lm_score registers as a declarative stage: fit-on-input, score
    columns joined back, optional max_ppl filter."""
    from hyped_spark.plans.spec import PipelineSpec

    spec = PipelineSpec(
        source=None,
        stages=[{"op": "lm_score", "vocab_size": 4, "max_ppl": 10.0}],
        name="ppl_gate",
    )
    spec = PipelineSpec.from_json(spec.to_json())
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = spec.transform(df).collect()
    exp = _expected(4)
    keep = {i for i, (_, _, ppl) in exp.items() if ppl <= 10.0}
    assert {r.doc_id for r in rows} == keep
    assert rows and {"text", "cross_entropy", "perplexity"} <= set(rows[0].asDict())


def test_ppl_partition_terciles(spark):
    """CCNet head/middle/tail: lowest-perplexity third labeled head,
    labels validated, exact-quantile boundary behavior deterministic."""
    from hyped_spark.operators.lm import ppl_partition

    scored = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 10)],
        "doc_id long, perplexity double")
    out = {r["doc_id"]: r["ppl_bucket"]
           for r in ppl_partition(scored).collect()}
    assert [out[i] for i in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3)

    import pytest as _pt
    with _pt.raises(ValueError):
        ppl_partition(scored, labels=("a", "b"))

    # custom split: a single median cutoff
    out2 = {r["doc_id"]: r["ppl_bucket"] for r in ppl_partition(
        scored, fractions=(0.5,), labels=("keep", "drop")).collect()}
    assert sum(1 for v in out2.values() if v == "keep") == 5


def test_ppl_partition_approx_mode_agrees(spark):
    """Scale path (exact=False, approx_percentile sketch): bounded-memory
    cutoffs must agree with the exact oracle mode away from quantile
    boundaries — at accuracy 1e6 over a small fixture the cutoffs are
    identical, so every label matches."""
    from hyped_spark.operators.lm import ppl_partition

    scored = spark.createDataFrame(
        [(i, float((i * 37) % 101) + 1.0) for i in range(1, 200)],
        "doc_id long, perplexity double")
    exact = {r["doc_id"]: r["ppl_bucket"]
             for r in ppl_partition(scored).collect()}
    approx = {r["doc_id"]: r["ppl_bucket"]
              for r in ppl_partition(scored, exact=False).collect()}
    diff = sum(1 for k in exact if exact[k] != approx[k])
    # tolerance: boundary docs only — approx error is <= 1/accuracy of
    # quantile mass, which on 199 rows is zero-to-a-couple rows
    assert diff <= 2, f"{diff} labels moved between modes"
