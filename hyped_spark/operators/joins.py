"""Cross-row join operators Spark lacks natively: as-of join, range join.

The reference has no cross-row joins (SURVEY §2.8); these are the
engine-level operators a CDC/analytics user needs, built shuffle-consciously:

- ``asof_join``  : for each left row, the latest right row with
  ``right.ts <= left.ts`` per key — implemented with the union+window trick
  (tag sides, single sort-shuffle on (key, ts), last non-null carry-forward).
  One shuffle total; no range explosion; scales to arbitrarily large sides
  (vs broadcast-and-filter or per-key ``merge_asof`` which needs grouping).
- ``range_join`` : interval-overlap equi-join via bucketization: each
  interval lands in the ``width``-sized buckets it covers; join on
  (key, bucket) then filter exact overlap and dedupe. Turns the O(n·m)
  theta-join into an equi-join Catalyst can hash-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row: columns of the nearest right row per ``by`` —
    ``direction="backward"``: most recent with ``right.on <= left.on``
    (the default, pandas ``merge_asof`` semantics); ``"forward"``: earliest
    with ``right.on >= left.on``. NULLs when none. Exactly one shuffle
    either way (the union+window trick just flips the sort order).

    ``tolerance``: optional SQL expression (e.g. ``"INTERVAL 1 HOUR"`` for
    timestamps, ``"5"`` for numerics); a match farther than this from
    ``left.on`` is nulled out — same output rows, bounded staleness.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in (on, by)]
    lrow_t = left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
    rrow_t = right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
    l_tag = left.select(
        F.col(by), F.col(on), F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__lrow"),
        F.lit(None).cast(rrow_t).alias("__rrow"),
    )
    r_tag = right.select(
        F.col(by), F.col(on), F.lit(0).alias("__is_left"),
        F.lit(None).cast(lrow_t).alias("__lrow"),
        F.struct(*right_cols).alias("__rrow"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts => right row AT left.ts
    # matches (inclusive bound, both directions)
    order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(by)
        .orderBy(order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__last_r", F.last("__rrow", ignorenulls=True).over(w)
    )
    if tolerance is not None:
        carried = carried.withColumn(
            "__r_on",
            F.last(F.when(F.col("__is_left") == 0, F.col(on)),
                   ignorenulls=True).over(w),
        )
    out = carried.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        delta = (F.col(on) - F.col("__r_on") if direction == "backward"
                 else F.col("__r_on") - F.col(on))
        out = out.withColumn(
            "__last_r",
            F.when(delta <= F.expr(tolerance), F.col("__last_r")),
        )
    lcols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    rcols = [
        F.col(f"__last_r.{c}").alias(c + suffix if c in left.columns else c)
        for c in right_cols
    ]
    return out.select(*lcols, *rcols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_range: tuple[str, str],
    right_range: tuple[str, str],
    by: str | None = None,
    width: int = 1000,
    how: str = "inner",
) -> DataFrame:
    """Interval-overlap join (end-exclusive) via bucket equi-join.

    ``width`` trades duplication (long intervals span many buckets) against
    bucket selectivity; pick ≈ the median interval length. The exact overlap
    predicate is re-applied after the equi-join; multi-bucket duplication is
    removed POSITIONALLY — each overlapping pair is kept only in the bucket
    containing the overlap's start, ``floor(max(lb, rb) / width)``, which
    both intervals provably cover. Unlike a ``distinct()`` on the projected
    row (round 1), this preserves genuinely duplicate input rows and needs
    no extra shuffle.

    Only inner semantics are sound here (bucket explosion would multiply
    outer-null matches and the overlap filter would drop them) — other
    ``how`` values raise.
    """
    if how != "inner":
        raise ValueError(
            "range_join supports only how='inner' (outer rows would be "
            "multiplied by bucket explosion and dropped by the overlap "
            f"filter); got {how!r}"
        )
    lb, le = left_range
    rb, re_ = right_range
    lbuck = left.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(F.col(lb) / width), F.floor((F.col(le) - 1) / width))),
    )
    rbuck = right.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(F.col(rb) / width), F.floor((F.col(re_) - 1) / width))),
    )
    keys = ["__bucket"] + ([by] if by else [])
    joined = lbuck.join(rbuck, keys)
    overlap = (F.col(lb) < F.col(re_)) & (F.col(rb) < F.col(le))
    first_shared = F.col("__bucket") == F.floor(F.greatest(F.col(lb), F.col(rb)) / width)
    out_cols = [c for c in joined.columns if c != "__bucket"]
    return joined.filter(overlap & first_shared).select(*out_cols)


def sessionize(
    df: DataFrame,
    ts_col: str,
    by: str,
    gap: str = "30 minutes",
    agg_cols: list | None = None,
) -> DataFrame:
    """Gap-based sessionization: group each key's events into sessions that
    close after ``gap`` of inactivity. Built on Spark's NATIVE
    ``session_window`` aggregate (the idiomatic form — the same expression
    works unchanged on a stream with a watermark), so the whole operator is
    one hash-partitioned aggregation: no self-join, no per-key collect,
    no window-function sort pass.

    Output: ``(by, session_start, session_end, n_events, *agg_cols)``,
    where ``session_end`` is the last event's timestamp plus ``gap``
    (Spark session_window semantics — the instant the session expires).
    """
    aggs = [F.count(F.lit(1)).alias("n_events")] + list(agg_cols or [])
    out = df.groupBy(by, F.session_window(F.col(ts_col), gap).alias("__w")) \
            .agg(*aggs)
    rest = [c for c in out.columns if c not in (by, "__w")]
    return out.select(
        by,
        F.col("__w.start").alias("session_start"),
        F.col("__w.end").alias("session_end"),
        *rest,
    )
