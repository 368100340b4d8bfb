"""Batch replay engine: LSN-chunked microbatches → transform → dedup → merge.

This is the heart of the CDC loop (SURVEY.md §7.3 M2). Each microbatch:

1. **transform** — vectorized HTML→text extraction (Arrow pandas UDF); null
   for deletes. This is the reference's heavy batch processor slot
   (/root/reference/src/hyped/data/processors/tokenizers/hf.py:404-441 is the
   model: declared output schema, batch-vectorized execution).
2. **dedup** — salted two-phase LWW reduce per url (skew-safe).
3. **merge** — idempotent bucket-level copy-on-write merge with
   transactional schema evolution (SnapshotTable.merge_batch).
4. **lineage** — one metrics row per (batch, bucket) appended to a metrics
   table: lsn range, rows applied, latency, snapshot id. The Spark-native
   replacement for the reference's consumer throughput meter
   (/root/reference/src/hyped/common/consumer.py:240-285).

The same `apply_batch` is the `foreachBatch` body of the streaming
front-end (hyped_spark.streaming) — batch and stream share one code path,
like the reference's shared batch/iterable `DataPipe.apply`
(/root/reference/src/hyped/data/pipe.py:288-407).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hyped_spark.functions.text import extract_text
from hyped_spark.lake.table import MergeStats, SnapshotTable
from hyped_spark.operators.lww import lww_dedup_salted

METRICS_SCHEMA = T.StructType([
    T.StructField("batch_id", T.LongType()),
    T.StructField("partition_id", T.IntegerType()),
    T.StructField("lsn_min", T.LongType()),
    T.StructField("lsn_max", T.LongType()),
    T.StructField("rows_applied", T.LongType()),
    T.StructField("merge_latency_ms", T.LongType()),
    T.StructField("snapshot_id", T.LongType()),
])


def target_schema(with_fetch_status: bool = False,
                  with_derived: bool = False) -> T.StructType:
    """Initial target-table schema (FIXTURES.md §1 + lsn for LWW/idempotence).

    ``with_derived`` adds the ingest-time analysis columns a web-scale
    pipeline computes while the bytes are hot (fingerprint for exact-dup
    keying, quality score, token count, language guess) — all native
    Catalyst expressions, no UDF. Off by default: measured ~5x ingest
    throughput cost (10+ regex passes per KB of text); turn on via
    ReplayConfig.derived_columns when the table should carry them."""
    fields = [
        T.StructField("url", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
    if with_derived:
        fields += [
            T.StructField("fingerprint", T.LongType()),
            T.StructField("quality", T.DoubleType()),
            T.StructField("n_tokens", T.IntegerType()),
            T.StructField("lang_guess", T.StringType()),
        ]
    if with_fetch_status:
        fields.append(T.StructField("fetch_status", T.LongType()))
    return T.StructType(fields)


def build_merge_source(events: DataFrame, n_salt: int = 16,
                       strategy: str = "maxjoin", key: str = "url",
                       ord_col: str = "lsn") -> DataFrame:
    """Change events → merge-ready source: LWW dedup + vectorized extraction.

    Physical strategy (measured — scripts/dedup_shape_bench.py):

    - "maxjoin" (default): light ``max(lsn)`` per key (codegen'd
      HashAggregate over pruned columns, true map-side combine = skew
      handling) + left-semi join back for the winner payload. Best absolute
      time at 4 and 16 cores; the payload moves once, never sorts.
    - "agg": ``max(struct(lsn, payload))`` — SortAggregate fallback for
      var-len payloads (see lww_dedup_agg caveat).
    - "salted": explicit two-phase salt for pathological cases.
    - ``text`` is extracted AFTER dedup: the Arrow UDF runs on ≤1 row per
      url, cutting UDF work by the batch's duplication factor.

    Note: ``ReplayEngine.apply_batch`` no longer routes through this — the
    merge fuses dedup+resolve+placement into one shuffle inside
    ``SnapshotTable.merge_events``. This remains the standalone composition
    for pipelines that want the merge-ready frame itself.
    """
    if strategy == "salted":
        deduped = lww_dedup_salted(events, key=key, ord_col=ord_col, n_salt=n_salt)
    elif strategy == "agg":
        from hyped_spark.operators.lww import lww_dedup_agg

        deduped = lww_dedup_agg(events, key=key, ord_col=ord_col)
    else:
        from hyped_spark.operators.lww import lww_dedup_maxjoin

        deduped = lww_dedup_maxjoin(events, key=key, ord_col=ord_col)
    return deduped.withColumn("text", extract_text(F.col("html")))


@dataclass
class ReplayConfig:
    table_path: str
    metrics_path: str
    batch_lsns: int = 100_000       # LSNs per microbatch
    n_buckets: int = 16             # table buckets (≫ at real scale)
    n_salt: int = 16                # salt fan-out for hot keys
    derived_columns: bool = False   # ingest-time analysis columns (see target_schema)
    merge_mode: str = "cow"         # "cow" | "mor" (see SnapshotTable.merge_events)
    key: str = "url"                # merge key column in the change log
    ord_col: str = "lsn"            # total-order column (the LSN)


class ReplayEngine:
    """Replays an ordered change log into a SnapshotTable, merging on
    ``cfg.key`` ordered by ``cfg.ord_col`` (defaults url/lsn)."""

    def __init__(self, spark: SparkSession, cfg: ReplayConfig):
        self.spark = spark
        self.cfg = cfg
        self.table = SnapshotTable(
            spark, cfg.table_path, key=cfg.key, ord_col=cfg.ord_col,
            n_buckets=cfg.n_buckets,
        )

    # -- metrics ------------------------------------------------------------

    def _append_metrics(self, stats: MergeStats) -> None:
        """Append lineage rows driver-side with pyarrow.

        The rows are metadata-sized (one per touched bucket); routing them
        through spark.createDataFrame + a write job measured ~5s per batch —
        pure fixed overhead. A direct pyarrow file write is <10ms and the
        result is still a plain parquet directory Spark reads back."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = [
            (stats.batch_id, b, stats.lsn_min, stats.lsn_max, n,
             stats.merge_latency_ms, stats.snapshot_id)
            for b, n in sorted((stats.bucket_rows or {}).items())
        ] or [(stats.batch_id, -1, stats.lsn_min, stats.lsn_max, 0,
               stats.merge_latency_ms, stats.snapshot_id)]
        cols = list(zip(*rows))
        table = pa.table({
            "batch_id": pa.array(cols[0], pa.int64()),
            "partition_id": pa.array(cols[1], pa.int32()),
            "lsn_min": pa.array(cols[2], pa.int64()),
            "lsn_max": pa.array(cols[3], pa.int64()),
            "rows_applied": pa.array(cols[4], pa.int64()),
            "merge_latency_ms": pa.array(cols[5], pa.int64()),
            "snapshot_id": pa.array(cols[6], pa.int64()),
        })
        os.makedirs(self.cfg.metrics_path, exist_ok=True)
        pq.write_table(
            table,
            os.path.join(self.cfg.metrics_path,
                         f"batch-{stats.batch_id:010d}-{stats.snapshot_id:010d}.parquet"),
        )

    def metrics(self) -> DataFrame:
        return self.spark.read.schema(METRICS_SCHEMA).parquet(self.cfg.metrics_path)

    # -- the loop -----------------------------------------------------------

    @staticmethod
    def _extract_transform(df: DataFrame) -> DataFrame:
        """Post-merge vectorized transform slot (the reference's heavy
        batch-processor position, tokenizers/hf.py:404-441):

        - HTML→text extraction (Arrow UDF) only on winner rows missing text.
          The UDF input is ``when(text IS NULL, html)`` so carried-forward
          rows (text already present) cross the Arrow boundary as NULLs —
          the payload transfer, not the regex work, was the measured cost;
        - ingest-time analysis columns (fingerprint / quality / token count /
          language guess) as native Catalyst expressions — JVM-side regex,
          whole-stage codegen, no extra Arrow pass."""
        from hyped_spark.functions.text import (
            extract_text,
            fingerprint_col,
            lang_id_col,
            quality_score_col,
            token_count_col,
        )

        out = (
            df.withColumn(
                "__extracted",
                extract_text(F.when(F.col("text").isNull(), F.col("html"))),
            )
            .withColumn("text", F.coalesce(F.col("text"), F.col("__extracted")))
            .drop("__extracted")
        )
        has = set(out.columns)
        t = F.col("text")
        if "fingerprint" in has:
            out = out.withColumn(
                "fingerprint",
                F.when(t.isNotNull(), fingerprint_col(t)),
            )
        if "quality" in has:
            out = out.withColumn("quality", F.when(t.isNotNull(), quality_score_col(t)))
        if "n_tokens" in has:
            out = out.withColumn(
                "n_tokens", F.when(t.isNotNull(), token_count_col(t)).cast("int")
            )
        if "lang_guess" in has:
            out = out.withColumn("lang_guess", F.when(t.isNotNull(), lang_id_col(t)))
        return out

    def apply_batch(self, events: DataFrame, batch_id: int,
                    guard: str = "lsn", stats_mode: str = "observe",
                    meta_rows: list | None = None) -> MergeStats:
        """Dedup + transform + merge + lineage for one microbatch of RAW
        change events. merge_events makes it one payload pass: a pruned
        (key, lsn) scan for guard/lineage, then a single heavy job.
        ``stats_mode="meta"`` is for foreachBatch callers (see merge_events);
        ``meta_rows`` is the precomputed per-bucket rollup (see replay)."""
        stats = self.table.merge_events(
            events, batch_id=batch_id, guard=guard, op_col="op",
            transform=self._extract_transform, stats_mode=stats_mode,
            meta_rows=meta_rows, merge_mode=self.cfg.merge_mode,
        )
        if not stats.skipped_replay:
            self._append_metrics(stats)
        return stats

    # batches per upfront lineage job: bounds the driver to
    # ≤ _META_CHUNK × n_buckets rollup rows in memory per collect (at
    # 10^3 batches × 10^4 buckets an unchunked collect would be 10^7 rows)
    _META_CHUNK = 64

    def _default_schema(self) -> T.StructType:
        """Default webtext target schema with the url/lsn fields renamed to
        the configured key/ord_col (no-op for the defaults)."""
        base = target_schema(with_derived=self.cfg.derived_columns)
        rename = {"url": self.cfg.key, "lsn": self.cfg.ord_col}
        return T.StructType([
            T.StructField(rename.get(f.name, f.name), f.dataType, f.nullable)
            for f in base.fields
        ])

    def replay(self, log: DataFrame, init_schema: T.StructType | None = None) -> list[MergeStats]:
        """Replay a whole log in ord-range microbatches.

        The per-batch filter ``ord ∈ [a, b)`` is pushed down to the parquet
        scan (row-group min/max pruning — segments are written in LSN order),
        so each batch reads only its slice of the log, not the whole log.
        """
        ordc = self.cfg.ord_col
        if self.table.current_version() < 0:
            self.table.init_empty(init_schema or self._default_schema())
        bounds = log.agg(F.min(ordc), F.max(ordc)).collect()[0]
        if bounds[0] is None:
            return []
        lo, hi = int(bounds[0]), int(bounds[1])
        out: list[MergeStats] = []
        start = self.table.last_committed_lsn() + 1  # resume point
        start = max(start, lo)
        # align batch boundaries to absolute LSN ranges so batch ids are
        # stable across resume (batch k always covers [k*B, (k+1)*B))
        first_batch = start // self.cfg.batch_lsns
        last_batch = hi // self.cfg.batch_lsns
        # One upfront lineage job per _META_CHUNK batches computes the
        # per-bucket rollup (guard bounds, touched buckets, raw counts): a
        # per-BATCH meta job was ~0.5s of parallelism-independent overhead
        # each — at 4 batches that alone capped N→4N scaling efficiency
        # (BENCH/BASELINE.md) — while one GLOBAL job is driver-unbounded.
        from hyped_spark.lake.table import bucket_expr

        B = self.cfg.batch_lsns
        commit = self.table.current_commit()
        n_buckets = int(commit["n_buckets"]) if commit else self.cfg.n_buckets
        for c0 in range(first_batch, last_batch + 1, self._META_CHUNK):
            c_last = min(c0 + self._META_CHUNK - 1, last_batch)
            chunk_meta = (
                log.filter(
                    (F.col(ordc) >= max(c0 * B, start))
                    & (F.col(ordc) < (c_last + 1) * B)
                )
                .select(
                    # exact integer division
                    F.expr(f"`{ordc}` DIV {B}").alias("__k"),
                    bucket_expr(self.cfg.key, n_buckets).alias("__bucket"),
                    F.col(ordc).alias("__ord"),
                )
                .groupBy("__k", "__bucket")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.min("__ord").alias("lmin"),
                    F.max("__ord").alias("lmax"),
                )
                .collect()
            )
            meta_by_batch: dict[int, list] = {}
            for r in chunk_meta:
                meta_by_batch.setdefault(int(r["__k"]), []).append(r)
            for k in range(c0, c_last + 1):
                a = max(k * B, start)
                b = (k + 1) * B
                batch = log.filter((F.col(ordc) >= a) & (F.col(ordc) < b))
                stats = self.apply_batch(
                    batch, batch_id=k, meta_rows=meta_by_batch.get(k, [])
                )
                out.append(stats)
        return out
