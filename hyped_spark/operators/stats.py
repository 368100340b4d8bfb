"""Statistics operators (reference A1–A6) — partial+final aggregation.

The reference computes per-batch partial aggregates merged under a lock
(/root/reference/src/hyped/data/processors/statistics/base.py:37-209,
report.py:18-147); Spark's hash aggregate does the same partial/final split
natively with map-side combine — these helpers only shape the query.

Each returns a small aggregate DataFrame (fits driver/broadcast); at 100 TB
the input-side scan is the cost and all of these are single-shuffle
(or shuffle-free for the global ones under partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mean_and_std(df: DataFrame, col: str) -> DataFrame:
    """≙ MeanAndStd (statistics/value/mean_and_std.py:25-184): Chan-style
    incremental merge == Spark's partial aggregation of avg/stddev/count."""
    return df.agg(
        F.mean(col).alias("mean"),
        F.stddev_pop(col).alias("std"),
        F.count(col).alias("n"),
    )


def histogram(df: DataFrame, col: str, low: float, high: float, n_bins: int) -> DataFrame:
    """≙ Histogram (statistics/value/hist.py:24-157): fixed-range binning
    with clipping — ``width_bucket`` + groupBy, one shuffle of n_bins rows."""
    clipped = F.least(F.greatest(F.col(col), F.lit(low)), F.lit(high))
    bin_idx = F.least(
        F.width_bucket(clipped, F.lit(low), F.lit(high), F.lit(n_bins)) - 1,
        F.lit(n_bins - 1),
    )
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_idx.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bin")
    )


def discrete_histogram(df: DataFrame, col: str) -> DataFrame:
    """≙ DiscreteHistogram (statistics/value/disc_hist.py:22-150)."""
    return df.groupBy(F.col(col).alias("value")).agg(F.count(F.lit(1)).alias("n"))


def seq_len_histogram(df: DataFrame, col: str) -> DataFrame:
    """≙ SequenceLengthHistogram (statistics/sequence/seq_len_hist.py:20-107)."""
    return df.groupBy(F.size(F.col(col)).alias("length")).agg(
        F.count(F.lit(1)).alias("n")
    )


def seq_val_histogram(df: DataFrame, col: str, low: float, high: float,
                      n_bins: int) -> DataFrame:
    """≙ SequenceValueHistogram (statistics/sequence/seq_val_hist.py:16-83):
    histogram over flattened array values (explode → bin → count)."""
    flat = df.select(F.explode(F.col(col)).alias("v"))
    return histogram(flat, "v", low, high, n_bins)


def disc_seq_val_histogram(df: DataFrame, col: str) -> DataFrame:
    """≙ DiscreteSequenceValueHistogram (statistics/sequence/
    disc_seq_val_hist.py:19-90)."""
    return (
        df.select(F.explode(F.col(col)).alias("value"))
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def percentiles(df: DataFrame, col: str, ps: list[float],
                by: str | None = None, round_dp: int = 4) -> DataFrame:
    """Exact percentiles with linear interpolation (SQL ``percentile_cont``
    semantics): one output row per (group,) percentile. Extends the
    reference's statistics family (mean/std, histograms — statistics/
    value/mean_std.py) with the order-statistics report every corpus
    analysis needs (length/quality cutoffs).

    ``F.percentile`` is the exact aggregate (sort-based within each
    group), computed ONCE for all requested percentiles, then exploded to
    rows. Deterministic — order statistics don't inherit float sum-order
    noise, so the DuckDB ``quantile_cont`` twin matches to rounding.
    """
    arr = F.array(*[F.lit(float(p)) for p in ps])
    keys = [by] if by else []
    agg = df.groupBy(*keys).agg(F.percentile(F.col(col), arr).alias("__v"))
    out = agg.select(
        *keys,
        F.posexplode("__v").alias("__i", "value"),
    )
    p_map = F.array(*[F.lit(float(p)) for p in ps])
    return out.select(
        *keys,
        F.element_at(p_map, F.col("__i") + 1).alias("p"),
        F.round(F.col("value"), round_dp).alias("value"),
    )


def statistics_report(df: DataFrame, specs: list[dict],
                      round_dp: int = 4) -> DataFrame:
    """Many statistics, ONE dataset pass — the reference's
    StatisticsReport (statistics/report.py:18-147 collects every
    registered statistic concurrently while the dataset streams once;
    base.py:37-209 merges per-batch partials under a lock). Spark's
    analogue is structural: every requested statistic compiles into one
    global ``agg`` whose partial aggregation does the per-partition work
    map-side, so N statistics cost one scan and ZERO shuffles (the final
    aggregate is a single 1-row reduce), vs N scans for N separate calls.

    ``specs``: list of dicts —
      {"kind": "mean_std",  "col": c}
      {"kind": "histogram", "col": c, "low": x, "high": y, "bins": n}
      {"kind": "seq_len_hist", "col": c, "low": x, "high": y, "bins": n}
        (sequence-length histogram — A4 at bounded bins)
      {"kind": "null_frac", "col": c}

    Output is LONG format, one row per (metric, value): metric names are
    ``<col>/mean``, ``<col>/std``, ``<col>/n``, ``<col>/bin<i>``,
    ``<col>/null_frac`` — report-sized, orderable, SQL-oracle-friendly.
    Discrete histograms (A3/A6) group by value and need their own shuffle;
    they stay separate calls by design.
    """
    aggs: list = []
    names: list[str] = []

    def bin_counts(value, low: float, high: float, bins: int, prefix: str):
        width = (high - low) / bins
        for i in range(bins):
            lo_i = low + i * width
            hi_i = high + 0.0 if i == bins - 1 else low + (i + 1) * width
            cond = (value >= F.lit(lo_i)) & (
                (value <= F.lit(hi_i)) if i == bins - 1 else (value < F.lit(hi_i))
            )
            aggs.append(F.sum(cond.cast("long")).cast("double"))
            names.append(f"{prefix}/bin{i}")

    for sp in specs:
        kind, c = sp["kind"], sp["col"]
        col = F.col(c)
        if kind == "mean_std":
            aggs += [F.round(F.mean(col), round_dp),
                     F.round(F.stddev_pop(col), round_dp),
                     F.count(col).cast("double")]
            names += [f"{c}/mean", f"{c}/std", f"{c}/n"]
        elif kind == "histogram":
            bin_counts(col, sp["low"], sp["high"], sp["bins"], c)
        elif kind == "seq_len_hist":
            bin_counts(F.size(col), sp["low"], sp["high"], sp["bins"], c)
        elif kind == "null_frac":
            aggs.append(F.round(
                F.sum(col.isNull().cast("long")) / F.count(F.lit(1)), round_dp))
            names.append(f"{c}/null_frac")
        else:
            raise ValueError(f"unknown statistic kind: {kind!r}")

    one = df.agg(*[a.alias(f"__s{i}") for i, a in enumerate(aggs)])
    stack = ", ".join(f"'{n}', __s{i}" for i, n in enumerate(names))
    return one.selectExpr(
        f"stack({len(names)}, {stack}) AS (metric, value)"
    )
