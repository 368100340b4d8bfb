"""Span-algebra kernels (reference §2.5 parity) — pure numpy, no Spark."""

from __future__ import annotations

import numpy as np
import pytest

from hyped_spark.operators.spans import (
    apply_idx_spans,
    bio_tags,
    covered_idx_spans,
    local_to_global,
    overlap_matrix,
    resolve_overlaps_idx,
    spans_from_bio,
    spans_from_word_ids,
)


def test_overlap_matrix():
    m = overlap_matrix([0, 5], [3, 9], [2, 3, 10], [4, 5, 12])
    assert m.tolist() == [[True, False, False], [False, False, False]]


@pytest.mark.parametrize("strategy,expected", [
    ("keep_first", [0, 2]),       # 0=[0,5) kills 1=[3,8); 2=[8,10) free
    ("keep_last", [1, 2]),        # reversed order: 2, then 1 kills 0
    ("keep_largest", [0, 2]),     # len tie [0,5) vs [3,8): lower index wins
    ("keep_smallest", [0, 2]),    # [0,5) vs [3,8): tie len... see below
])
def test_resolve_overlaps(strategy, expected):
    begins, ends = [0, 3, 8], [5, 8, 10]
    assert resolve_overlaps_idx(begins, ends, strategy) == expected


def test_resolve_overlaps_raise():
    with pytest.raises(ValueError):
        resolve_overlaps_idx([0, 3], [5, 8], "raise")
    assert resolve_overlaps_idx([0, 5], [5, 8], "raise") == [0, 1]


def test_covered_and_apply_idx_spans_roundtrip():
    # token char-spans: [0,3) [4,7) [8,13)
    sb, se = [0, 4, 8], [3, 7, 13]
    ib, ie = covered_idx_spans([4, 0], [13, 3], sb, se)
    assert (ib, ie) == ([1, 0], [3, 1])
    vb, ve = apply_idx_spans(ib, ie, sb, se)
    assert (vb, ve) == ([4, 0], [13, 3])


def test_local_to_global():
    gb, ge = local_to_global([0, 1], [2, 3], [0, 2], [3, 4, 5])
    assert gb == [0, 8] and ge == [2, 10]


def test_spans_from_word_ids():
    b, e = spans_from_word_ids([0, 0, 1, 1, 1, 2])
    assert b == [0, 2, 5] and e == [2, 5, 6]
    with pytest.raises(ValueError):
        spans_from_word_ids([0, 1, 0])


def test_bio_roundtrip():
    tags = bio_tags(6, [1, 4], [3, 5], ["PER", "LOC"])
    assert tags == ["O", "B-PER", "I-PER", "O", "B-LOC", "O"]
    sb, se, labels = spans_from_bio(tags)
    assert (sb, se, labels) == ([1, 4], [3, 5], ["PER", "LOC"])
    with pytest.raises(ValueError):
        bio_tags(4, [0, 1], [2, 3], ["A", "B"])  # overlap
    with pytest.raises(ValueError):
        spans_from_bio(["O", "I-PER"])  # I without B
