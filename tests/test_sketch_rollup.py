"""Streaming HLL rollup: batch-equivalence, idempotence, crash recovery."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hyped_spark.operators.sketches import hll_count_distinct
from hyped_spark.streaming.sketch_rollup import HllRollup

SF = "/root/testdata/sf0.001"


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_rollup_equals_whole_corpus_sketch(spark, tmp_path):
    """N micro-batches folded into the store == one sketch of everything
    (EXACT register equality — merge is associative, not approximate)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    roll = HllRollup(str(tmp_path / "hll"), "user_id", p=10,
                     group_cols=("event_type",))
    for i in range(4):
        roll.update(ev.filter(F.col("event_id") % 4 == i))
    whole = hll_count_distinct(ev, "user_id", p=10,
                               group_cols=("event_type",))
    assert _rows(roll.estimate(spark)) == _rows(whole)


def test_rollup_redelivery_is_noop(spark, tmp_path):
    """foreachBatch's at-least-once: re-applying a batch changes nothing
    (max-merge idempotence — the reason no batch-id guard exists here)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    batch = ev.filter("event_id % 3 = 0")
    roll = HllRollup(str(tmp_path / "hll"), "user_id", p=10)
    roll.update(batch)
    before = _rows(roll.registers(spark))
    roll.update(batch)  # duplicate delivery
    assert _rows(roll.registers(spark)) == before


def test_rollup_recovers_from_halfswap(spark, tmp_path):
    """A death between the two renames leaves only .old; a fresh rollup
    rolls it back and continues."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    store = str(tmp_path / "hll")
    roll = HllRollup(store, "user_id", p=10)
    roll.update(ev)
    want = _rows(roll.registers(spark))
    os.rename(store, store + ".old")  # simulate crash mid-swap
    recovered = HllRollup(store, "user_id", p=10)
    assert _rows(recovered.registers(spark)) == want


def test_rollup_as_stream_sink(spark, tmp_path):
    """Drive it through a real file-source stream; the final estimate
    equals the batch-built one exactly."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "src")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).write.parquet(
            f"{src}/seg={i}")
    roll = HllRollup(str(tmp_path / "hll"), "user_id", p=10)
    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 2).parquet(f"{src}/seg=*")
    q = stream.writeStream.foreachBatch(roll.foreach_batch()).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    whole = hll_count_distinct(ev, "user_id", p=10)
    assert _rows(roll.estimate(spark)) == _rows(whole)


def test_rollup_empty_store_estimate(spark, tmp_path):
    # global (ungrouped) estimate of an empty store is exactly 0
    roll = HllRollup(str(tmp_path / "hll"), "user_id", p=10)
    rows = roll.estimate(spark).collect()
    assert len(rows) == 1 and rows[0]["est_distinct"] == 0
