"""Continuous sketch maintenance over a stream: an HLL register store
updated per micro-batch.

The operational question a 100 TB CDC pipeline actually asks is "how many
distinct users/urls/keys so far, per group, RIGHT NOW" — an exact
streaming COUNT(DISTINCT) needs unbounded state, and re-scanning the
corpus per refresh is off the table. HLL registers are the fix: the store
is at most ``2^p`` rows per group forever, each micro-batch folds in with
an associative max-merge (operators/sketches.py: hll_merge), and — the
property that makes this SAFE under foreachBatch's at-least-once contract
— the merge is IDEMPOTENT: re-delivering a batch re-maxes the same rhos
and changes nothing, so no batch-id guard is needed (unlike the counting
merge in streaming/stream.py, which must dedup batch ids).

Store layout: a parquet dir swapped via the repo's crash-safe rename-aside
protocol (same as scripts/run_curation_job.py's dedup index): write
``.next``, rename live aside to ``.old``, promote, delete — a death at any
point leaves a recoverable store, and ``_recover`` rolls back a half-swap
on startup.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from hyped_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_registers,
)


class HllRollup:
    """Maintains an HLL register store for ``col`` (optionally per
    ``group_cols``) across micro-batches. Use :meth:`foreach_batch` as a
    ``writeStream.foreachBatch`` sink, or call :meth:`update` directly
    from a batch-incremental job."""

    def __init__(
        self,
        store_path: str,
        col: str,
        p: int = 12,
        group_cols: tuple[str, ...] = (),
        hash_mode: str = "xxhash64",
    ) -> None:
        self.store_path = store_path
        self.col = col
        self.p = p
        self.group_cols = tuple(group_cols)
        self.hash_mode = hash_mode
        self._recover()

    def _recover(self) -> None:
        old = self.store_path + ".old"
        if os.path.isdir(old) and not os.path.isdir(self.store_path):
            os.rename(old, self.store_path)

    def registers(self, spark: SparkSession) -> DataFrame:
        """Current register table (empty-schema frame before first update)."""
        if os.path.isdir(self.store_path):
            return spark.read.parquet(self.store_path)
        fields = ", ".join(
            [*(f"{g} string" for g in self.group_cols),
             "bucket long", "rho int"]
        )
        return spark.createDataFrame([], fields)

    def update(self, batch_df: DataFrame) -> None:
        """Fold one batch into the store. Idempotent: re-applying the same
        batch is a no-op (max-merge), so at-least-once delivery is safe."""
        spark = batch_df.sparkSession
        batch_regs = hll_registers(
            batch_df, self.col, self.p, self.group_cols, self.hash_mode
        )
        if os.path.isdir(self.store_path):
            merged = hll_merge(self.registers(spark), batch_regs)
        else:
            merged = batch_regs
        tmp = self.store_path + ".next"
        # registers are sketch-sized (<= 2^p rows per group): one file
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = self.store_path + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(self.store_path):
            os.rename(self.store_path, old)
        os.rename(tmp, self.store_path)
        shutil.rmtree(old, ignore_errors=True)
        spark.catalog.refreshByPath(self.store_path)

    def foreach_batch(self):
        """``foreachBatch``-shaped sink function."""
        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            self.update(batch_df)

        return fn

    def estimate(self, spark: SparkSession) -> DataFrame:
        """Current distinct-count estimate per group."""
        return hll_estimate(self.registers(spark), self.p, self.group_cols)
