"""Cross-document duplicated-substring spans (Lee et al. 2022 style)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

BOILER = "subscribe to our newsletter for the latest updates and offers"


def _frame(spark):
    # doc 1 and doc 2 share a 10-token run (BOILER) at different offsets;
    # doc 3 is unrelated; doc 4 is shorter than n; doc 5 shares a SECOND,
    # disjoint run with doc 1 to exercise multi-span output.
    rows = [
        (1, f"alpha beta {BOILER} gamma delta epsilon zeta eta theta iota "
            f"unique one two three closing words here {('x y z a b c d e f g')}"),
        (2, f"totally different opening words {BOILER} and a different tail"),
        (3, "no shared content in this document at all just filler words "
            "filler filler more filler"),
        (4, "too short"),
        (5, f"another document that repeats x y z a b c d e f g at its end"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("hash_mode", ["xxhash64", "md5"])
def test_duplicate_spans_basic(spark, hash_mode):
    from hyped_spark.operators.substrings import duplicate_ngram_spans

    out = duplicate_ngram_spans(
        _frame(spark), n=8, hash_mode=hash_mode
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_end, r.span_tokens)
        )
    # doc 3 (unrelated) and doc 4 (< n tokens) never appear
    assert 3 not in by_doc and 4 not in by_doc
    # doc 2: BOILER is tokens 4..14 (10 tokens) — exactly one span
    assert by_doc[2] == [(4, 14, 10)]
    # doc 5: the shared x..g run is its last 10 tokens
    (s5,) = by_doc[5]
    assert s5[1] - s5[0] == 10
    # doc 1 carries BOTH shared runs as separate (non-merged) spans
    spans1 = sorted(by_doc[1])
    assert len(spans1) == 2
    assert spans1[0] == (2, 12, 10)  # BOILER at tokens 2..12
    assert spans1[1][2] == 10        # the x..g run


def test_duplicate_spans_merge_overlapping(spark):
    """Two duplicated windows that overlap merge into one maximal span."""
    from hyped_spark.operators.substrings import duplicate_ngram_spans

    shared = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame(
        [(1, f"head {shared} tail"), (2, f"other {shared} words")],
        "doc_id long, text string",
    )
    out = duplicate_ngram_spans(df, n=8).filter(F.col("doc_id") == 1).collect()
    assert len(out) == 1
    # 12 shared tokens at offset 1 → one maximal span [1, 13)
    assert (out[0].span_start, out[0].span_end) == (1, 13)


def test_duplicate_token_frac(spark):
    from hyped_spark.operators.substrings import duplicate_token_frac

    out = {
        r.doc_id: r
        for r in duplicate_token_frac(_frame(spark), n=8).collect()
    }
    # every input row appears, clean docs at 0.0
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[3].dup_token_frac == 0.0 and out[4].dup_token_frac == 0.0
    assert out[2].dup_tokens == 10
    assert out[1].dup_tokens == 20  # both runs
    assert 0.0 < out[2].dup_token_frac < 1.0


def test_hash_modes_agree(spark):
    from hyped_spark.operators.substrings import duplicate_ngram_spans

    a = sorted(
        map(tuple, duplicate_ngram_spans(_frame(spark), n=8).collect())
    )
    b = sorted(
        map(
            tuple,
            duplicate_ngram_spans(_frame(spark), n=8, hash_mode="md5").collect(),
        )
    )
    assert a == b


def test_no_cartesian_in_plan(spark):
    """The candidate join is a hash-equi join on the gram hash only."""
    from hyped_spark.operators.substrings import duplicate_ngram_spans

    plan = duplicate_ngram_spans(_frame(spark), n=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_cut_duplicate_spans(spark):
    from hyped_spark.operators.substrings import cut_duplicate_spans

    out = {
        r.doc_id: r.clean_text
        for r in cut_duplicate_spans(_frame(spark), n=8).collect()
    }
    # every row survives
    assert set(out) == {1, 2, 3, 4, 5}
    # doc 2: BOILER removed, surrounding tokens re-joined
    assert out[2] == "totally different opening words and a different tail"
    # doc 5: trailing shared run removed
    assert out[5] == "another document that repeats at its end"
    # clean docs pass through with normalized (lowercased, tokenized) text
    assert out[4] == "too short"
    assert "filler" in out[3]
    # doc 1 loses BOTH runs but keeps everything between them
    assert "subscribe" not in out[1] and "newsletter" not in out[1]
    assert out[1].startswith("alpha beta gamma")
    assert out[1].endswith("closing words here")
