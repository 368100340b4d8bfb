"""Last-writer-wins per-batch deduplication (the merge kernel).

The reference's closest analogue is greedy span-overlap conflict resolution
(resolve_overlaps KEEP_LAST, /root/reference/src/hyped/data/processors/spans/
common.py:148-232) — per-key conflict resolution by an ordering column. Here
it is the relational form: one surviving row per key, max order column.

Two physical strategies, same logical result:

- ``lww_dedup``            : window-rank ``row_number() over (partition by key
                             order by ord desc) = 1``. One shuffle on key.
- ``lww_dedup_salted``     : two-phase for skewed keys — pre-reduce per
                             (key, salt) then reduce per key. The first
                             aggregation is map-side-combinable and spreads a
                             hot key over ``n_salt`` reducers, so no single
                             task receives the whole hot key's data. Use when
                             one url can dominate a microbatch (north rule
                             skew requirement).

Plus two aggregation forms (``lww_dedup_agg``, ``lww_dedup_maxjoin``) with
measured trade-offs documented on each. The merge engine itself
(lake/table.py) uses a bucket-partitioned window rank — the bucket exchange
doubles as table placement and WindowGroupLimit drops losers during the
sort; ``lww_dedup_salted`` is its hot-key pre-reduce
(merge_events(pre_reduce="salted")).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_dedup(df: DataFrame, key: str = "url", ord_col: str = "lsn") -> DataFrame:
    """Keep the max-``ord_col`` row per ``key`` (window-rank form).

    Ties on ``ord_col`` cannot occur in a binlog (LSN is a total order); if
    the input violates that, the winner among equal LSNs is unspecified.
    """
    w = Window.partitionBy(key).orderBy(F.col(ord_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def lww_dedup_agg(df: DataFrame, key: str = "url", ord_col: str = "lsn") -> DataFrame:
    """Same result via aggregation: ``max(struct(ord, *payload))``.

    CAVEAT (measured, scripts/dedup_shape_bench.py): with variable-length
    payload fields (strings/binary) this compiles to SortAggregate — the
    payload is sorted in both the partial and final phases. Prefer
    ``lww_dedup_maxjoin`` for wide/var-len payloads; this form is ideal only
    for narrow fixed-width payloads where the fixed-size hash-agg buffer
    applies (true map-side combine).
    """
    payload = [c for c in df.columns if c != key]
    # ord_col first in the struct => struct max == max by ord_col
    ordered = [ord_col] + [c for c in payload if c != ord_col]
    packed = df.groupBy(key).agg(
        F.max(F.struct(*[F.col(c) for c in ordered])).alias("__best")
    )
    return packed.select(key, *[F.col(f"__best.{c}").alias(c) for c in ordered])


def lww_dedup_maxjoin(df: DataFrame, key: str = "url", ord_col: str = "lsn") -> DataFrame:
    """LWW dedup as argmax-via-join: light ``max(ord)`` hash aggregation
    (fixed-size buffer → codegen'd HashAggregate with true map-side combine)
    + equi-join back on (key, ord) to fetch the winner's payload.

    Why: ``max(struct(ord, payload))`` with variable-length payload fields
    (html binary) can't use the fixed-size hash-agg buffer — Spark falls
    back to an object/sort aggregate that moves the payload through the
    aggregation. Here the aggregation touches only (key, ord) — parquet
    column pruning keeps the payload out of it entirely — and the payload
    moves exactly once, through the join shuffle. Requires ord unique per
    (key, ord) pair (an LSN total order guarantees it globally).
    """
    winners = df.groupBy(key).agg(F.max(ord_col).alias(ord_col))
    return df.join(winners, [key, ord_col], "left_semi")


def lww_dedup_salted(
    df: DataFrame,
    key: str = "url",
    ord_col: str = "lsn",
    n_salt: int = 16,
) -> DataFrame:
    """Skew-resistant two-phase LWW reduce.

    Phase 1 groups by (key, salt) where salt spreads a hot key across
    ``n_salt`` reducers; phase 2 reduces the ≤``n_salt`` survivors per key.
    The salt is derived from ``ord_col`` (deterministic, no rand()) so
    repeated runs produce identical plans and results.
    """
    payload = [c for c in df.columns if c != key]
    ordered = [ord_col] + [c for c in payload if c != ord_col]
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(ord_col)), F.lit(n_salt)))
    phase1 = salted.groupBy(key, "__salt").agg(
        F.max(F.struct(*[F.col(c) for c in ordered])).alias("__best")
    )
    phase2 = phase1.groupBy(key).agg(F.max("__best").alias("__best"))
    return phase2.select(key, *[F.col(f"__best.{c}").alias(c) for c in ordered])
