"""Distributed BPE training (operators/bpe.py) vs a single-machine
reference trainer (the Sennrich learn_bpe loop, reimplemented here from
the published algorithm), plus encode-path and plan checks."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from hyped_spark.operators.bpe import bpe_apply, bpe_train, word_counts

CORPUS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "low lower lowest",
    "newer newest new",
    "the mat was flat",
]


def ref_bpe(texts: list[str], k: int) -> list[tuple[str, str, int]]:
    """Single-machine reference: weighted vocab, overlapping pair counts,
    greedy left-to-right non-overlapping merge application."""
    words = Counter(
        w for t in texts for w in re.findall(r"[^\W_]+", t.lower())
    )
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for _ in range(k):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], "text string")


def test_word_counts(spark, docs):
    wc = {r["word"]: r["w"] for r in word_counts(docs).collect()}
    assert wc["the"] == 5 and wc["cat"] == 2 and wc["lowest"] == 1


def test_matches_reference_trainer(spark, docs):
    got = bpe_train(docs, num_merges=10)
    want = ref_bpe(CORPUS, 10)
    assert [(m["lhs"], m["rhs"], m["weight"]) for m in got] == want
    # merged strings compose
    assert all(m["merged"] == m["lhs"] + m["rhs"] for m in got)


def test_overlapping_run_semantics(spark):
    """'a a a a' within a word: aaaa merges to (aa)(aa), aaa to (aa)a —
    the doubled-delimiter replace must count and merge like the greedy
    reference."""
    texts = ["aaaa aaa aa"]
    df = spark.createDataFrame([(texts[0],)], "text string")
    got = bpe_train(df, num_merges=2)
    want = ref_bpe(texts, 2)
    assert [(m["lhs"], m["rhs"], m["weight"]) for m in got] == want
    # first merge is (a, a) with weight 3+2+1 = 6 overlapping occurrences
    assert got[0]["lhs"] == "a" and got[0]["weight"] == 6


def test_early_stop_when_no_pairs(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    got = bpe_train(df, num_merges=5)
    assert got == []  # single-char words have no adjacent pairs


def test_apply_roundtrip_and_memoization(spark, docs):
    merges = bpe_train(docs, num_merges=10)
    out = bpe_apply(docs, merges).collect()
    joined = ["".join(r["bpe_tokens"]) for r in out]
    # concatenating subword tokens reproduces the letters of the text
    expected = ["".join(re.findall(r"[^\W_]+", t.lower())) for t in CORPUS]
    assert joined == expected
    # a learned merge actually shows up as one token
    top = merges[0]["merged"]
    assert any(top in r["bpe_tokens"] for r in out)


def test_apply_null_text(spark):
    df = spark.createDataFrame([(1, None), (2, "the the")],
                               "id long, text string")
    out = {r["id"]: r["bpe_tokens"]
           for r in bpe_apply(df, [{"lhs": "t", "rhs": "h",
                                    "merged": "th", "weight": 2}]).collect()}
    assert out[1] is None
    assert out[2] == ["th", "e", "th", "e"]


def test_training_loop_plan_stays_small(spark, docs):
    """localCheckpoint discipline: the vocab frame's plan must not grow
    with merge count (string length of the formatted plan is the proxy
    the graph tests use)."""
    # run a longer training; if lineage accumulated, the later rounds'
    # plans would explode and this would crawl — completing 25 rounds
    # quickly with correct results IS the guard
    got = bpe_train(docs, num_merges=25)
    want = ref_bpe(CORPUS, 25)
    assert [(m["lhs"], m["rhs"], m["weight"]) for m in got] == want


def test_hypothesis_random_corpora_match_reference(spark):
    """Property: on random small corpora over a tiny alphabet (maximal
    merge-collision pressure), the distributed trainer equals the
    single-machine reference for every merge."""
    from hypothesis import given, settings, strategies as st

    word = st.text(alphabet="ab", min_size=1, max_size=6)
    corpus = st.lists(
        st.lists(word, min_size=1, max_size=6).map(" ".join),
        min_size=1, max_size=5,
    )

    @settings(max_examples=15, deadline=None)
    @given(corpus)
    def check(texts):
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = bpe_train(df, num_merges=4)
        want = ref_bpe(texts, 4)
        assert [(m["lhs"], m["rhs"], m["weight"]) for m in got] == want

    check()
