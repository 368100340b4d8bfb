"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

At 100 TB a scan's cost is decided by how many files/row-groups survive
min-max pruning. A table sorted on ONE column prunes perfectly on that
column and not at all on any other; interleaving the bits of several
columns' range-buckets (the Morton curve — public knowledge, the same
layout Delta Lake's OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite
use) gives every interleaved column locality, so a predicate box on ANY
subset of them touches O(box volume) files instead of all of them.

Everything here is native integer/float expressions (whole-stage codegen,
no UDFs), and the bucket math is plain IEEE arithmetic — so the key is
bit-for-bit replayable in DuckDB for oracle checks.

Scale shape: one pass to compute bounds (an agg that collects 2×N doubles
to the driver — metadata-sized), then ``repartitionByRange`` on the key
(one range-exchange, same cost class as any sort) + within-partition sort.
No payload ever moves twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Clamped equal-width bucket of ``c`` into [0, 2**bits) — degenerate
    bounds (lo == hi) put every row in bucket 0."""
    top = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scale = top / (hi - lo)
    raw = F.floor((c.cast("double") - F.lit(float(lo))) * F.lit(scale)).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(top))


def z_order_key(cols: list[Column], bounds: list[tuple[float, float]],
                bits: int = 16) -> Column:
    """Morton key: interleave the ``bits``-wide range-buckets of each
    column, column j owning bit positions ``i*len(cols)+j``. Native-only."""
    nc = len(cols)
    if nc == 0:
        raise ValueError("z_order_key needs at least one column")
    if bits * nc > 63:
        raise ValueError(f"bits*n_cols = {bits * nc} exceeds a signed long")
    bs = [_bucket(c, lo, hi, bits) for c, (lo, hi) in zip(cols, bounds)]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bs):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * nc + j)
            )
    return key


def z_order_key_sql(exprs: list[str], bounds: list[tuple[float, float]],
                    bits: int = 16) -> str:
    """DuckDB twin of :func:`z_order_key` — the identical double-precision
    bucket arithmetic and bit plumbing, so oracles replay the key exactly."""
    nc = len(exprs)
    top = (1 << bits) - 1
    bs = []
    for e, (lo, hi) in zip(exprs, bounds):
        if hi <= lo:
            bs.append("CAST(0 AS BIGINT)")
        else:
            scale = top / (hi - lo)
            bs.append(
                f"least(greatest(CAST(floor((CAST({e} AS DOUBLE) - {lo!r})"
                f" * {scale!r}) AS BIGINT), 0), {top})"
            )
    terms = [
        f"((({b} >> {i}) & 1) << {i * nc + j})"
        for i in range(bits) for j, b in enumerate(bs)
    ]
    return "(" + " | ".join(terms) + ")"


def column_bounds(df: DataFrame, cols: list[str]) -> list[tuple[float, float]]:
    """One metadata-sized agg → [(min, max)] per column (2N doubles)."""
    row = df.agg(*[f for c in cols
                   for f in (F.min(F.col(c).cast("double")),
                             F.max(F.col(c).cast("double")))]).first()
    return [(row[2 * i], row[2 * i + 1]) for i in range(len(cols))]


def z_order_sort(df: DataFrame, cols: list[str],
                 bounds: list[tuple[float, float]] | None = None,
                 bits: int = 16, n_partitions: int | None = None) -> DataFrame:
    """Cluster ``df`` along the Morton curve of ``cols`` so a parquet write
    of the result gets tight per-file min-max ranges on EVERY listed column.

    The key is dropped after the sort — projection preserves the
    within-partition order, so downstream writes keep the clustering."""
    if bounds is None:
        bounds = column_bounds(df, cols)
    key = z_order_key([F.col(c) for c in cols], bounds, bits)
    out = df.withColumn("__zkey", key)
    out = (out.repartitionByRange(n_partitions, "__zkey") if n_partitions
           else out.repartitionByRange("__zkey"))
    return out.sortWithinPartitions("__zkey").drop("__zkey")
