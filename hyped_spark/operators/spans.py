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
    """n×m boolean: span i of set1 overlaps span j of set2 (end-exclusive).

    Matches the reference's definition (spans/common.py:89-145) exactly,
    including empty spans: a zero-length span contained in (or equal to)
    another span counts as overlapping, which the plain
    ``(b1 < e2) & (b2 < e1)`` test misses at the begin boundary.
    """
    b1 = np.asarray(b1).reshape(-1)[:, None]
    e1 = np.asarray(e1).reshape(-1)[:, None]
    b2 = np.asarray(b2).reshape(-1)[None, :]
    e2 = np.asarray(e2).reshape(-1)[None, :]
    covers_begin = (b1 <= b2) & (b2 < e1)
    covers_end = (b1 < e2) & (e2 <= e1)
    contains = (b1 <= b2) & (e2 <= e1)
    contained = (b2 <= b1) & (e1 <= e2)
    return covers_begin | covers_end | contains | contained


_STRATEGIES = {"approx", "raise", "keep_first", "keep_last",
               "keep_largest", "keep_smallest"}


def resolve_overlaps_mask(begins, ends, strategy: str = "approx") -> list[bool]:
    """Resolve span overlaps — keep-mask over the spans.

    Same algorithm as the reference (spans/common.py:148-232, default
    strategy APPROX): repeatedly drop the span overlapping the most others,
    where the strategy restricts which member of the worst overlap group is
    droppable (keep_first protects the first span in the group, keep_largest
    protects the unique largest, etc.; approx applies no restriction).
    Iterative removal — not greedy selection — so chained overlaps resolve
    identically to the reference for every strategy.
    """
    if strategy not in _STRATEGIES:
        raise ValueError(f"unknown strategy {strategy!r}")
    n = len(begins)
    overlap = overlap_matrix(begins, ends, begins, ends)
    counts = overlap.sum(axis=1).astype(int)
    sizes = np.asarray(ends, dtype=int) - np.asarray(begins, dtype=int)

    while (counts > 1).any():
        if strategy == "raise":
            raise ValueError("overlapping spans with strategy=raise")
        # the overlap group of the currently-worst span
        group = overlap[counts.argmax(), :].copy()
        if strategy == "keep_first":
            group[int(group.argmax())] = False
        elif strategy == "keep_last":
            group[int(np.nonzero(group)[0][-1])] = False
        elif strategy == "keep_largest":
            gs = sizes[group]
            if (gs < gs.max()).any():
                group[group] &= gs < gs.max()
        elif strategy == "keep_smallest":
            gs = sizes[group]
            if (gs > gs.min()).any():
                group[group] &= gs > gs.min()
        # among the remaining candidates, drop the most-overlapping one
        group[group] = counts[group] == counts[group].max()
        drop = int(group.argmax())
        counts = counts - overlap[drop, :].astype(int)
        counts[drop] = -1
        overlap[:, drop] = False
        overlap[drop, :] = False
    return (counts != -1).tolist()


def resolve_overlaps_idx(begins, ends, strategy: str = "keep_largest") -> list[int]:
    """Kept indices (sorted) — see resolve_overlaps_mask for semantics."""
    mask = resolve_overlaps_mask(begins, ends, strategy)
    return [i for i, keep in enumerate(mask) if keep]


def relex_mark(
    seq,
    src_span: tuple[int, int],
    tgt_span: tuple[int, int],
    markers,
    max_sequence_length: int | None = None,
    source_inclusive: bool = False,
    target_inclusive: bool = False,
):
    """RelEx marker insertion + window truncation (reference V9,
    taggers/relex.py:32-288). Returns the marked sequence, or None when the
    entity distance exceeds ``max_sequence_length`` (row filtered —
    the reference's generator-empty case).

    ``markers`` = (source_begin, source_end, target_begin, target_end);
    spans are converted to end-exclusive first, so end markers land after
    the entity's last item.
    """
    seq = list(seq)
    n = len(seq)
    positions = [
        src_span[0], src_span[1] + int(source_inclusive),
        tgt_span[0], tgt_span[1] + int(target_inclusive),
    ]
    if max_sequence_length is not None:
        lo, hi = min(positions), max(positions)
        if hi - lo > max_sequence_length:
            return None
        budget = max_sequence_length - 4  # four markers join the sequence
        slack = budget - (hi - lo)
        i = max(0, lo - slack // 2)
        j = min(n, i + budget)
        i = max(0, j - budget)
        seq = seq[i:j]
        positions = [p - i for p in positions]
    # insert back-to-front so earlier insertions don't shift later targets;
    # tie-break at equal positions matches the reference (relex.py:284)
    for k in sorted(range(4), key=lambda k: -positions[k] - k // 2):
        seq.insert(positions[k], markers[k])
    return seq


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


def make_relex_udf(markers, max_sequence_length: int | None = None,
                   source_inclusive: bool = False,
                   target_inclusive: bool = False,
                   element_type: T.DataType | None = None):
    """Arrow-vectorized RelEx marker UDF (V9): (seq, sb, se, tb, te) →
    marked sequence, or NULL when the entity distance exceeds the max
    (the caller filters NULLs = the reference's row-dropping generator)."""
    et = element_type or T.StringType()

    @F.pandas_udf(T.ArrayType(et))
    def relex(seq: pd.Series, sb: pd.Series, se: pd.Series,
              tb: pd.Series, te: pd.Series) -> pd.Series:  # pragma: no cover
        return pd.Series([
            relex_mark(s, (int(b1), int(e1)), (int(b2), int(e2)), markers,
                       max_sequence_length, source_inclusive, target_inclusive)
            for s, b1, e1, b2, e2 in zip(seq, sb, se, tb, te)
        ])

    return relex


def relex_tag(df, seq_col: str, src_begin: str, src_end: str,
              tgt_begin: str, tgt_end: str, markers,
              out_col: str = "marked_sequence", **kwargs):
    """RelExTagger (reference taggers/relex.py:32-288): insert the four
    entity markers into ``seq_col``; rows whose entity distance exceeds
    ``max_sequence_length`` are filtered out (generator-empty semantics)."""
    elem = df.schema[seq_col].dataType.elementType
    udf = make_relex_udf(markers, element_type=elem, **kwargs)
    out = df.withColumn(
        out_col,
        udf(F.col(seq_col), F.col(src_begin), F.col(src_end),
            F.col(tgt_begin), F.col(tgt_end)),
    )
    return out.filter(F.col(out_col).isNotNull())
