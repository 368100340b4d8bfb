"""Streaming ingest: readStream over the segment directory → foreachBatch.

The batch applier IS the streaming applier (``ReplayEngine.apply_batch`` as
the ``foreachBatch`` body) — one code path for batch and stream, mirroring
the reference's shared Dataset/IterableDataset ``DataPipe.apply``
(/root/reference/src/hyped/data/pipe.py:288-407).

Exactly-once is layered:
1. Spark's streaming checkpoint tracks which source files each epoch read —
   restart never re-reads consumed files except for the in-flight epoch.
2. The in-flight epoch CAN be re-delivered after a crash; the table's
   LSN-range commit guard (SnapshotTable.merge_batch) detects the replay and
   makes it a no-op — the sink is idempotent, so "at-least-once delivery +
   idempotent sink = exactly-once effect".

Schema evolution in a stream: a Structured Streaming source has a fixed
schema per query. We read with the latest (widest) schema — parquet segments
written before a column-add read as NULLs. A type-widen lands as a stream
RESTART with the widened schema (the standard registry-driven CDC pattern);
``run_stream`` loops restarts until the log is drained, and the table's
schema evolution is still commit-transactional per microbatch. The pure
batch path (ReplayEngine.replay / per-segment apply_batch) demonstrates
in-stream evolution without restart.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hyped_spark.plans.replay import ReplayConfig, ReplayEngine, target_schema


def binlog_stream_schema(with_fetch_status: bool = True) -> T.StructType:
    fields = [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("lang", T.StringType()),
    ]
    if with_fetch_status:
        fields.append(T.StructField("fetch_status", T.LongType()))
    return T.StructType(fields)


@dataclass
class StreamConfig:
    source_dir: str          # directory of binlog segment parquet dirs
    checkpoint_dir: str
    table_path: str
    metrics_path: str
    n_buckets: int = 16
    n_salt: int = 16
    max_files_per_trigger: int = 4


def stream_once(spark: SparkSession, cfg: StreamConfig,
                schema: T.StructType | None = None) -> ReplayEngine:
    """Drain everything currently in ``source_dir`` through one streaming
    query (Trigger.AvailableNow semantics via processAllAvailable), then
    stop. Returns the engine for inspection."""
    schema = schema or binlog_stream_schema()
    engine = ReplayEngine(
        spark,
        ReplayConfig(
            table_path=cfg.table_path,
            metrics_path=cfg.metrics_path,
            n_buckets=cfg.n_buckets,
            n_salt=cfg.n_salt,
        ),
    )
    if engine.table.current_version() < 0:
        engine.table.init_empty(target_schema())

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", cfg.max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(os.path.join(cfg.source_dir, "seg*"))
    )

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        # epoch ids are monotone across restarts (streaming checkpoint), but
        # their LSN contents need not be ordered — use the batch-id guard;
        # tombstoned LWW makes out-of-order epoch application commutative.
        # stats_mode="meta": an Observation inside foreachBatch deadlocks.
        # persist: the meta pre-job and the heavy merge job both consume the
        # epoch frame — unpersisted, each re-reads the epoch's source files
        # (2x source IO, and the input-rows meter double-counts). One
        # epoch's data is bounded by maxFilesPerTrigger, so caching is safe.
        batch_df.persist()
        try:
            engine.apply_batch(batch_df, batch_id=int(epoch_id),
                               guard="batch_id", stats_mode="meta")
        finally:
            batch_df.unpersist()

    q = (
        src.writeStream.foreachBatch(apply)
        .option("checkpointLocation", cfg.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return engine


def infer_stream_schema(spark: SparkSession,
                        source_dir: str) -> T.StructType | None:
    """Widest schema across the segment dirs currently present, folded with
    the engine's own evolution rules (column adds + safe type widens —
    parquet mergeSchema would refuse an int→long widen). None when no
    segments exist yet."""
    import glob

    from hyped_spark.schema import apply_diff, diff_schemas

    segs = sorted(glob.glob(os.path.join(source_dir, "seg*")))
    if not segs:
        return None
    cur = spark.read.parquet(segs[0]).schema
    for s in segs[1:]:
        cur = apply_diff(cur, diff_schemas(cur, spark.read.parquet(s).schema))
    return cur


def run_stream(spark: SparkSession, cfg: StreamConfig,
               schema: T.StructType | None = None) -> ReplayEngine:
    """Public entry: loop ``stream_once`` until the source dir is drained.

    Each pass reads with the widest schema across the segments present
    (``infer_stream_schema``) unless an explicit ``schema`` pins it — a
    mid-stream type widen therefore lands as a stream RESTART with the
    widened schema (the standard registry-driven CDC pattern) without the
    caller having to know to call again. Termination: a pass that commits
    no new snapshot under an unchanged schema means nothing is left to
    drain. Restart-safe: call again after a crash or after new segments
    land — the streaming checkpoint skips consumed files."""
    engine = None
    prev: tuple | None = None
    while True:
        s = schema if schema is not None else infer_stream_schema(
            spark, cfg.source_dir
        )
        engine = stream_once(spark, cfg, s)
        cur = (s.json() if s is not None else None,
               engine.table.current_version())
        if cur == prev:
            return engine
        prev = cur
