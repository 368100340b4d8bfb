"""Array/sequence operators (reference R3–R6, X1) — all native Catalyst.

- ``join_str_seq``   ≙ JoinStringSequence (/root/reference/src/hyped/data/
  processors/sequence/join_str_seq.py:14-81) → ``array_join``.
- ``extend_seq``     ≙ ExtendSequence (sequence/extend.py:20-91) → concat of
  literal arrays.
- ``apply_mask``     ≙ ApplyMask (sequence/apply_mask.py:19-116): filter
  parallel arrays by a boolean mask array, with runtime length validation.
- ``filter_seq``     ≙ FilterSequence (sequence/filter.py:19-98): keep items
  in a valid set, emit kept items + the boolean mask.
- ``chunk_seq``      ≙ ChunkSequence (sequence/chunk.py:19-171): split an
  array into (overlapping) windows — 1 row → k rows, the reference's
  generator fan-out (base.py:371-415) expressed as explode.

Everything stays in whole-stage codegen: no UDFs, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_str_seq(df: DataFrame, col: str, out: str, delimiter: str = " ") -> DataFrame:
    return df.withColumn(out, F.array_join(F.col(col), delimiter))


def extend_seq(df: DataFrame, col: str, out: str,
               prepend: list | None = None, append: list | None = None) -> DataFrame:
    parts: list[Column] = []
    if prepend:
        parts.append(F.array(*[F.lit(v) for v in prepend]))
    parts.append(F.col(col))
    if append:
        parts.append(F.array(*[F.lit(v) for v in append]))
    return df.withColumn(out, F.concat(*parts))


def apply_mask(df: DataFrame, mask_col: str, seq_cols: list[str],
               suffix: str = "_masked") -> DataFrame:
    """Keep elements of each sequence where the parallel mask is true.

    Length mismatch raises at runtime via ``raise_error`` (the reference
    validates per batch, apply_mask.py:76-98) — expressed natively with
    ``assert_true`` so the check also runs codegen'd.
    """
    out = df
    for c in seq_cols:
        checked = F.when(
            F.size(F.col(c)) != F.size(F.col(mask_col)),
            F.raise_error(F.lit(f"mask length mismatch for column '{c}'")),
        ).otherwise(F.col(c))
        zipped = F.zip_with(checked, F.col(mask_col),
                            lambda v, m: F.struct(v.alias("v"), m.alias("m")))
        out = out.withColumn(
            c + suffix,
            F.transform(F.filter(zipped, lambda s: s["m"]), lambda s: s["v"]),
        )
    return out


def filter_seq(df: DataFrame, col: str, valid: list, out: str,
               mask_out: str | None = None) -> DataFrame:
    valid_arr = F.array(*[F.lit(v) for v in valid])
    res = df.withColumn(out, F.filter(F.col(col), lambda x: F.array_contains(valid_arr, x)))
    if mask_out:
        res = res.withColumn(
            mask_out, F.transform(F.col(col), lambda x: F.array_contains(valid_arr, x))
        )
    return res


def chunk_seq(df: DataFrame, col: str, out: str, chunk_size: int,
              chunk_stride: int | None = None, drop_last: bool = False,
              with_pos: bool = True) -> DataFrame:
    """Explode an array column into (overlapping) chunks: 1 row → k rows.

    Chunk starts are 0, stride, 2*stride, ...; a chunk is kept if it is full
    (``drop_last``) or non-empty. Fan-out provenance (the reference's
    src_index, base.py:289-304) is free: input columns are carried on every
    output row, and ``with_pos`` adds the chunk ordinal.
    """
    stride = chunk_stride or chunk_size
    n = F.size(F.col(col))
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.slice(F.col(col), s + 1, chunk_size))
    keep_min = chunk_size if drop_last else 1
    chunks = F.filter(chunks, lambda c: F.size(c) >= keep_min)
    if with_pos:
        ex = F.posexplode(chunks)
        return df.select("*", ex.alias("chunk_pos", out)).drop(col)
    return df.select("*", F.explode(chunks).alias(out)).drop(col)
