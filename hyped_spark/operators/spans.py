"""Span / interval algebra (reference §2.5, V1–V8) — vectorized pandas UDFs.

The reference's span core is per-row numpy over (begins, ends) arrays:
- overlap matrix      ≙ compute_spans_overlap_matrix
  (/root/reference/src/hyped/data/processors/spans/common.py:89-145)
- resolve_overlaps    ≙ spans/common.py:148-232 (strategies KEEP_FIRST/
  KEEP_LAST/KEEP_LARGEST/KEEP_SMALLEST/APPROX/RAISE)
- covered index spans ≙ spans/idx_spans.py:22-210 (char-span → token-span)
- apply index spans   ≙ spans/apply_idx_spans.py:23-201 (inverse)
- local→global        ≙ spans/loc_to_glob.py:21-238 (cumsum re-basing)
- word-id boundaries  ≙ spans/from_word_ids.py:18-134
- BIO tag / untag     ≙ taggers/bio.py:32-280, spans/from_bio.py:19-199

Spans are modelled as two parallel ``array<int>`` columns (begins, ends),
end-exclusive, like the reference after normalization. All UDFs are
Arrow-vectorized (one numpy pass per row inside an Arrow batch) — the
per-row math is tiny; the win is batch transport, exactly like the
reference's ``internal_batch_process`` override.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# numpy kernels (pure; unit-testable without Spark)
# ---------------------------------------------------------------------------


def overlap_matrix(b1, e1, b2, e2) -> np.ndarray:
    """n×m boolean: span i of set1 overlaps span j of set2 (end-exclusive)."""
    b1 = np.asarray(b1)[:, None]
    e1 = np.asarray(e1)[:, None]
    b2 = np.asarray(b2)[None, :]
    e2 = np.asarray(e2)[None, :]
    return (b1 < e2) & (b2 < e1)


def resolve_overlaps_idx(begins, ends, strategy: str = "keep_largest") -> list[int]:
    """Greedy maximum-non-overlap subset; returns kept indices (sorted).

    Strategies mirror the reference: keep_first (lowest index wins),
    keep_last, keep_largest (longest wins), keep_smallest, raise.
    """
    n = len(begins)
    order = list(range(n))
    if strategy == "keep_largest":
        order.sort(key=lambda i: (-(ends[i] - begins[i]), i))
    elif strategy == "keep_smallest":
        order.sort(key=lambda i: (ends[i] - begins[i], i))
    elif strategy == "keep_last":
        order = order[::-1]
    elif strategy == "raise":
        m = overlap_matrix(begins, ends, begins, ends)
        np.fill_diagonal(m, False)
        if m.any():
            raise ValueError("overlapping spans with strategy=raise")
        return list(range(n))
    elif strategy != "keep_first":
        raise ValueError(f"unknown strategy {strategy!r}")
    kept: list[int] = []
    for i in order:
        if all(not (begins[i] < ends[j] and begins[j] < ends[i]) for j in kept):
            kept.append(i)
    return sorted(kept)


def covered_idx_spans(qb, qe, sb, se) -> tuple[list[int], list[int]]:
    """Map query value-spans (qb,qe) to index-spans over an ordered span
    sequence (sb,se): smallest [i,j) of sequence spans covering the query."""
    sb = np.asarray(sb)
    se = np.asarray(se)
    out_b, out_e = [], []
    for b, e in zip(qb, qe):
        i = int(np.searchsorted(se, b, side="right"))
        j = int(np.searchsorted(sb, e, side="left"))
        if i >= j:  # query not covered by any span
            i = j = 0 if len(sb) == 0 else min(i, j)
        out_b.append(i)
        out_e.append(j)
    return out_b, out_e


def apply_idx_spans(ib, ie, sb, se) -> tuple[list[int], list[int]]:
    """Inverse of covered_idx_spans: [i,j) index spans → value spans
    (sb[i], se[j-1])."""
    out_b, out_e = [], []
    for i, j in zip(ib, ie):
        if j > i:
            out_b.append(int(sb[i]))
            out_e.append(int(se[j - 1]))
        else:
            out_b.append(0)
            out_e.append(0)
    return out_b, out_e


def local_to_global(local_b, local_e, word_ids, word_lens) -> tuple[list[int], list[int]]:
    """Re-base local (per-word) offsets to global coordinates:
    global = local + cumsum(word_lens)[word_id - 1] (+word separators none).
    """
    offsets = np.concatenate([[0], np.cumsum(word_lens)[:-1]]) if len(word_lens) else np.array([0])
    gb = [int(b + offsets[w]) for b, w in zip(local_b, word_ids)]
    ge = [int(e + offsets[w]) for e, w in zip(local_e, word_ids)]
    return gb, ge


def spans_from_word_ids(word_ids) -> tuple[list[int], list[int]]:
    """Boundary detection on a monotone id sequence → [begin,end) token spans
    per distinct id. Monotonicity validated (reference from_word_ids.py)."""
    ids = np.asarray(word_ids)
    if len(ids) == 0:
        return [], []
    if (np.diff(ids) < 0).any():
        raise ValueError("word_ids must be monotone non-decreasing")
    change = np.nonzero(np.diff(ids))[0] + 1
    begins = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(ids)]])
    return begins.tolist(), ends.tolist()


def bio_tags(n_tokens: int, sb, se, labels) -> list[str]:
    """Spans + labels → per-token BIO tags; overlap raises (taggers/bio.py)."""
    tags = ["O"] * n_tokens
    for b, e, lab in zip(sb, se, labels):
        if any(t != "O" for t in tags[b:e]):
            raise ValueError("overlapping entity spans in BIO tagging")
        for k in range(b, e):
            tags[k] = ("B-" if k == b else "I-") + lab
    return tags


def spans_from_bio(tags) -> tuple[list[int], list[int], list[str]]:
    """Inverse of bio_tags with scheme validation (spans/from_bio.py)."""
    sb, se, labels = [], [], []
    cur = None
    for i, t in enumerate(tags):
        if t == "O":
            if cur is not None:
                se.append(i)
                cur = None
            continue
        kind, _, lab = t.partition("-")
        if kind == "B" or (cur is not None and lab != cur) or cur is None:
            if kind == "I" and cur is None:
                raise ValueError(f"I- tag without B- at position {i}")
            if cur is not None:
                se.append(i)
            sb.append(i)
            labels.append(lab)
            cur = lab
    if cur is not None:
        se.append(len(tags))
    return sb, se, labels


# ---------------------------------------------------------------------------
# Spark-facing pandas UDFs
# ---------------------------------------------------------------------------

_SPAN_PAIR = T.StructType([
    T.StructField("begins", T.ArrayType(T.IntegerType())),
    T.StructField("ends", T.ArrayType(T.IntegerType())),
])


@F.pandas_udf(T.ArrayType(T.ArrayType(T.BooleanType())))
def spans_overlap_matrix_udf(b1: pd.Series, e1: pd.Series, b2: pd.Series,
                             e2: pd.Series) -> pd.Series:  # pragma: no cover
    return pd.Series([
        overlap_matrix(x1, y1, x2, y2).tolist()
        for x1, y1, x2, y2 in zip(b1, e1, b2, e2)
    ])


def make_resolve_overlaps_udf(strategy: str = "keep_largest"):
    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def resolve(b: pd.Series, e: pd.Series) -> pd.Series:  # pragma: no cover
        return pd.Series([resolve_overlaps_idx(x, y, strategy) for x, y in zip(b, e)])
    return resolve


@F.pandas_udf(_SPAN_PAIR)
def covered_idx_spans_udf(qb: pd.Series, qe: pd.Series, sb: pd.Series,
                          se: pd.Series) -> pd.DataFrame:  # pragma: no cover
    rows = [covered_idx_spans(a, b, c, d) for a, b, c, d in zip(qb, qe, sb, se)]
    return pd.DataFrame({"begins": [r[0] for r in rows], "ends": [r[1] for r in rows]})


@F.pandas_udf(_SPAN_PAIR)
def apply_idx_spans_udf(ib: pd.Series, ie: pd.Series, sb: pd.Series,
                        se: pd.Series) -> pd.DataFrame:  # pragma: no cover
    rows = [apply_idx_spans(a, b, c, d) for a, b, c, d in zip(ib, ie, sb, se)]
    return pd.DataFrame({"begins": [r[0] for r in rows], "ends": [r[1] for r in rows]})


@F.pandas_udf(_SPAN_PAIR)
def spans_from_word_ids_udf(wids: pd.Series) -> pd.DataFrame:  # pragma: no cover
    rows = [spans_from_word_ids(w) for w in wids]
    return pd.DataFrame({"begins": [r[0] for r in rows], "ends": [r[1] for r in rows]})


@F.pandas_udf(T.ArrayType(T.StringType()))
def bio_tags_udf(n: pd.Series, sb: pd.Series, se: pd.Series,
                 labels: pd.Series) -> pd.Series:  # pragma: no cover
    return pd.Series([
        bio_tags(int(k), a, b, c) for k, a, b, c in zip(n, sb, se, labels)
    ])
