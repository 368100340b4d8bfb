"""Lineage/metrics analysis + side-output statistics.

The metrics table (one row per (batch, bucket), written by ReplayEngine) is
the engine's replacement for the reference's live consumer throughput meter
(/root/reference/src/hyped/common/consumer.py:240-285). These helpers turn
it into the operational views the north rule asks for, and ``observe``
attaches statistics to a DataFrame as a query side-output — the Spark-native
form of the reference's pass-through statistics processors
(statistics/base.py:37-209): aggregates computed during the SAME job that
produces the data, no second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def batch_summary(metrics: DataFrame) -> DataFrame:
    """Per-batch rollup: offset range, rows, latency, events/sec, skew.

    A crash-resume can re-apply a partially-applied batch id, leaving TWO
    metrics files for the same batch (different snapshot_id). The rollup
    keeps only the rows of the LATEST snapshot per batch — the completed
    application — so resumed runs produce a stable, non-double-counted
    summary (F.first over mixed files was nondeterministic)."""
    latest = metrics.groupBy("batch_id").agg(
        F.max("snapshot_id").alias("snapshot_id")
    )
    per_batch = metrics.join(latest, ["batch_id", "snapshot_id"]).groupBy(
        "batch_id"
    ).agg(
        F.min("lsn_min").alias("lsn_min"),
        F.max("lsn_max").alias("lsn_max"),
        F.max("snapshot_id").alias("snapshot_id"),
        F.max("merge_latency_ms").alias("merge_latency_ms"),
        F.sum("rows_applied").alias("rows_applied"),
        F.count(F.lit(1)).alias("n_partitions"),
        F.max("rows_applied").alias("max_partition_rows"),
    )
    return per_batch.select(
        "*",
        F.round(
            F.col("rows_applied") / (F.col("merge_latency_ms") / 1000.0), 1
        ).alias("rows_per_sec"),
        # partition balance: 1.0 = perfectly even; >>1 = skewed buckets.
        # Proves the skew handling worked (north-rule requirement).
        F.round(
            F.col("max_partition_rows")
            / (F.col("rows_applied") / F.col("n_partitions")),
            2,
        ).alias("skew_factor"),
    ).orderBy("batch_id")


def lineage_check(metrics: DataFrame) -> dict:
    """Invariants over the lineage table (FIXTURES.md §3): contiguous,
    non-overlapping lsn ranges; returns a small dict of booleans/counters."""
    batches = batch_summary(metrics).collect()
    ok_order = all(
        batches[i].lsn_min > batches[i - 1].lsn_max for i in range(1, len(batches))
    )
    return {
        "n_batches": len(batches),
        "ranges_ordered_non_overlapping": ok_order,
        "total_rows_applied": sum(b.rows_applied for b in batches),
        "max_skew_factor": max((b.skew_factor for b in batches), default=0.0),
    }


def observe(df: DataFrame, name: str, **aggs) -> tuple[DataFrame, Observation]:
    """Attach named aggregates as a side-output of whatever job consumes
    ``df`` next (≙ hyped statistics: same pass, no extra scan)::

        df2, obs = observe(df, "stats", n=F.count(F.lit(1)),
                           mean_len=F.mean(F.length("text")))
        df2.write.parquet(...)      # the real job
        obs.get                     # {'n': ..., 'mean_len': ...}
    """
    obs = Observation(name)
    return df.observe(obs, *[v.alias(k) for k, v in aggs.items()]), obs
