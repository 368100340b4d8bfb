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


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    window_dur: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time windowed counts with late-data handling — the one place
    this engine NEEDS a watermark (SURVEY §2.9: the LWW merge does not —
    LSN order makes late updates harmless; tombstones make them commute).

    Returns a streaming aggregate suitable for append-mode sinks: a window
    emits exactly once, when the watermark (max observed event time minus
    the configured delay) passes its end, and its state is evicted — so
    state scales with windows-in-flight, not stream length. Note Spark's
    watermark guarantee is one-sided: data less late than the delay is
    always aggregated, but later data MAY still create (small, late)
    windows rather than being dropped; pre-filter against a stamped
    watermark if strictly-no-late output is required."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_dur))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            F.col("n"),
        )
    )


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


class ThroughputMeter:
    """Live events/sec meter for streaming queries — the Spark-native
    analogue of the reference consumer's EMA examples/sec display
    (/root/reference/src/hyped/common/consumer.py:240-285).

    Attach with ``spark.streams.addListener(meter.listener())``; each epoch
    updates ``rows_total``, instantaneous ``rows_per_sec``, and an EMA with
    the same smoothing role as the reference's tqdm meter. ``history`` keeps
    one record per epoch for post-run inspection.
    """

    def __init__(self, alpha: float = 0.3):
        self.alpha = alpha
        self.rows_total = 0
        self.rows_per_sec = 0.0
        self.ema_rows_per_sec: float | None = None
        self.history: list[dict] = []

    def _update(self, batch_id: int, n_rows: int, rps: float) -> None:
        self.rows_total += n_rows
        self.rows_per_sec = rps
        self.ema_rows_per_sec = (
            rps if self.ema_rows_per_sec is None
            else self.alpha * rps + (1 - self.alpha) * self.ema_rows_per_sec
        )
        self.history.append({
            "batch_id": batch_id, "rows": n_rows, "rows_per_sec": rps,
            "ema_rows_per_sec": self.ema_rows_per_sec,
            "rows_total": self.rows_total,
        })

    def listener(self):
        from pyspark.sql.streaming import StreamingQueryListener

        meter = self

        class _Listener(StreamingQueryListener):
            def onQueryStarted(self, event):  # pragma: no cover (callback)
                pass

            def onQueryProgress(self, event):
                p = event.progress
                meter._update(
                    int(p.batchId), int(p.numInputRows),
                    float(p.processedRowsPerSecond or 0.0),
                )

            def onQueryIdle(self, event):  # pragma: no cover (callback)
                pass

            def onQueryTerminated(self, event):  # pragma: no cover (callback)
                pass

        return _Listener()


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
