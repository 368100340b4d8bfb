"""DSIR importance resampling (operators/dsir.py) — Xie et al. 2023.

Constructed corpora with genuinely distinct vocabularies (the sf tables
share one vocab across langs, so they can't show selection power):
target = "physics" documents; the raw pool mixes physics and cooking.
DSIR must (a) weigh physics-like raw docs higher, (b) resample mostly
physics docs, (c) be deterministic, (d) stay map-only on the weigh path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hyped_spark.operators.dsir import (
    dsir_log_ratio,
    dsir_logweight,
    dsir_resample,
    dsir_select,
    fit_hashed_gram_dist,
    gumbel_key_col,
    hashed_gram_buckets_col,
)

PHYS = [
    "quantum field theory predicts particle interactions",
    "the electron wave function collapses on measurement",
    "general relativity curves spacetime near mass",
    "entropy increases in every isolated thermodynamic system",
    "photon momentum transfers during compton scattering",
    "the hamiltonian operator generates time evolution",
]
COOK = [
    "simmer the onions in butter until golden",
    "whisk eggs with sugar and fold in flour",
    "roast the chicken with garlic and thyme",
    "knead the dough and let it rise overnight",
    "season the broth with ginger and scallions",
    "caramelize sugar slowly for the custard glaze",
]


@pytest.fixture(scope="module")
def corpora(spark):
    target = spark.createDataFrame(
        [(i, t) for i, t in enumerate(PHYS)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(PHYS)]
        + [(200 + i, t) for i, t in enumerate(COOK)],
        "doc_id long, text string",
    )
    return target, raw


def test_gram_buckets_unigram_bigram_counts(spark):
    df = spark.createDataFrame([("a b c",), ("solo",), ("",)], "text string")
    out = df.select(
        F.size(hashed_gram_buckets_col(F.col("text"), 64)).alias("n")
    ).collect()
    # "a b c" → 3 unigrams + 2 bigrams; "solo" → 1 + 0; "" → 0
    assert [r["n"] for r in out] == [5, 1, 0]


def test_fit_is_a_distribution(spark, corpora):
    target, _ = corpora
    import math

    logp = fit_hashed_gram_dist(target, buckets=128, alpha=0.5)
    assert len(logp) == 128
    # probabilities sum to 1 (within rounding-at-8dp slack)
    assert abs(sum(math.exp(x) for x in logp) - 1.0) < 1e-4


def test_weights_separate_domains(spark, corpora):
    target, raw = corpora
    lp_t = fit_hashed_gram_dist(target, buckets=256)
    lp_q = fit_hashed_gram_dist(raw, buckets=256)
    lam = dsir_log_ratio(lp_t, lp_q)
    w = {
        r["doc_id"]: r["logw"]
        for r in dsir_logweight(raw, lam).collect()
    }
    phys_w = [w[100 + i] for i in range(len(PHYS))]
    cook_w = [w[200 + i] for i in range(len(COOK))]
    assert min(phys_w) > max(cook_w)


def test_resample_prefers_target_like_docs(spark, corpora):
    target, raw = corpora
    sel = dsir_select(target, raw, k=6, buckets=256, seed=7)
    ids = sorted(r["doc_id"] for r in sel.collect())
    # at least 5 of 6 selected are physics docs (Gumbel noise can let one
    # cooking doc slip in, but the weights dominate)
    assert sum(1 for i in ids if i < 200) >= 5
    assert len(ids) == 6


def test_resample_deterministic_and_seed_sensitive(spark, corpora):
    target, raw = corpora
    lp_t = fit_hashed_gram_dist(target, buckets=256)
    lp_q = fit_hashed_gram_dist(raw, buckets=256)
    lam = dsir_log_ratio(lp_t, lp_q)
    a = sorted(r["doc_id"] for r in dsir_resample(raw, lam, 4, seed=1).collect())
    b = sorted(r["doc_id"] for r in dsir_resample(raw, lam, 4, seed=1).collect())
    assert a == b
    # different seeds explore different samples across SOME seed pair
    others = {
        tuple(sorted(r["doc_id"] for r in
                     dsir_resample(raw, lam, 4, seed=s).collect()))
        for s in (2, 3, 4, 5)
    }
    assert len(others | {tuple(a)}) > 1


def test_empty_doc_scores_zero(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    out = dsir_logweight(df, [0.5] * 32).collect()
    assert out[0]["logw"] == 0.0


def test_gumbel_key_monotone_in_logw(spark):
    # same id (same noise), higher logw → higher key
    df = spark.createDataFrame([(1, 0.0), (1, 2.0)], "id long, lw double")
    keys = [
        r["k"] for r in
        df.select(gumbel_key_col(F.col("id"), F.col("lw")).alias("k"))
        .collect()
    ]
    assert keys[1] == pytest.approx(keys[0] + 2.0)


def test_dsir_spec_stage_roundtrip(spark, corpora, tmp_path):
    """The registered `dsir_select` spec op: target corpus by path, JSON
    round-trip, compiled result equals the library call."""
    from hyped_spark.plans.spec import PipelineSpec, SourceSpec

    target, raw = corpora
    tdir = str(tmp_path / "target")
    rdir = str(tmp_path / "raw")
    target.write.parquet(tdir)
    raw.write.parquet(rdir)
    spec = PipelineSpec(
        source=SourceSpec(format="parquet", path=rdir),
        stages=[{"op": "dsir_select", "target_path": tdir, "k": 5,
                 "buckets": 256, "seed": 7}],
        name="dsir",
    )
    spec2 = PipelineSpec.from_json(spec.to_json())
    assert spec2.to_json() == spec.to_json()
    got = sorted(r["doc_id"] for r in spec2.compile(spark).collect())
    want = sorted(
        r["doc_id"]
        for r in dsir_select(
            spark.read.parquet(tdir), spark.read.parquet(rdir),
            k=5, buckets=256, seed=7,
        ).collect()
    )
    assert got == want and len(got) == 5


def test_weigh_plan_is_map_only(spark, corpora):
    """The 100-TB path: no exchange, no Python eval in the weigh plan."""
    import io
    from contextlib import redirect_stdout

    _, raw = corpora
    df = dsir_logweight(raw, [0.0] * 64)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    # the 1-row λ BroadcastExchange is the design; what must be absent is
    # any shuffle exchange over the corpus
    import re as _re

    assert not _re.search(r"\(\d+\) Exchange\b", p)
    assert "hashpartitioning" not in p
    assert "EvalPython" not in p and "InPandas" not in p
    assert "BroadcastNestedLoopJoin" in p
