"""Structured Streaming front-end: drain segments, exactly-once, resume."""

from __future__ import annotations

import pandas as pd

from hyped_spark.sources.synthetic import binlog, write_binlog_segments
from hyped_spark.streaming.stream import StreamConfig, run_stream

from tests.replayer import replay_reference

N_EVENTS = 1_200
N_URLS = 80


def _cfg(tmp_path) -> StreamConfig:
    return StreamConfig(
        source_dir=str(tmp_path / "log"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        table_path=str(tmp_path / "table"),
        metrics_path=str(tmp_path / "metrics"),
        n_buckets=8,
        n_salt=4,
        max_files_per_trigger=3,
    )


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = [c for c in ["url", "lsn", "warc_ts", "html", "text", "lang", "fetch_status"]
            if c in pdf.columns]
    return pdf[cols].sort_values("url").reset_index(drop=True)


def test_stream_drain_matches_reference(spark, tmp_path):
    from hyped_spark.streaming.metrics import ThroughputMeter

    cfg = _cfg(tmp_path)
    write_binlog_segments(spark, cfg.source_dir, N_EVENTS, N_URLS)
    meter = ThroughputMeter()
    listener = meter.listener()
    spark.streams.addListener(listener)
    try:
        engine = run_stream(spark, cfg)
        # listener events are delivered asynchronously — wait for the tail
        import time

        deadline = time.monotonic() + 30
        while meter.rows_total < N_EVENTS and time.monotonic() < deadline:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)

    # live throughput meter (S6 analogue): every epoch recorded, totals add
    # up exactly (the persist in stream.apply also makes numInputRows 1x —
    # unpersisted, the meta + merge passes each rescan the epoch's files)
    assert meter.rows_total == N_EVENTS
    assert meter.history and meter.ema_rows_per_sec is not None
    assert all(h["rows_per_sec"] >= 0 for h in meter.history)

    ref = replay_reference(binlog(spark, N_EVENTS, N_URLS).toPandas())
    got = engine.table.read().toPandas()
    e, r = _normalize(got), _normalize(ref)
    if "fetch_status" in e.columns:
        e["fetch_status"] = e["fetch_status"].astype("Int64")
        r["fetch_status"] = r["fetch_status"].astype("Int64")
    pd.testing.assert_frame_equal(e, r, check_dtype=False)

    # restart with same checkpoint: nothing new -> no new snapshots
    v = engine.table.current_version()
    engine2 = run_stream(spark, cfg)
    assert engine2.table.current_version() == v


def test_stream_resume_after_new_segments(spark, tmp_path):
    """Drain half the log, then land the rest and drain again (tail -f)."""
    import os
    cfg = _cfg(tmp_path)
    os.makedirs(cfg.source_dir, exist_ok=True)
    # full segment set written to a staging dir; move segments in two waves
    staging = str(tmp_path / "staging")
    paths = write_binlog_segments(spark, staging, N_EVENTS, N_URLS)
    os.rename(paths[0], os.path.join(cfg.source_dir, "seg00000"))
    run_stream(spark, cfg)
    for p in paths[1:]:
        os.rename(p, os.path.join(cfg.source_dir, os.path.basename(p)))
    engine = run_stream(spark, cfg)

    ref = replay_reference(binlog(spark, N_EVENTS, N_URLS).toPandas())
    e = _normalize(engine.table.read().toPandas())
    r = _normalize(ref)
    pd.testing.assert_frame_equal(e, r, check_dtype=False)


def test_stream_schema_widen_via_restart(spark, tmp_path):
    """A mid-stream type widen (fetch_status int→long) drains through
    run_stream alone: the second call infers the widened schema from the
    new segment and restarts the query from the checkpoint — the streaming
    twin of the batch path's test_schema_evolution_segments."""
    import os

    from pyspark.sql import types as T

    cfg = _cfg(tmp_path)
    os.makedirs(cfg.source_dir, exist_ok=True)
    staging = str(tmp_path / "staging")
    paths = write_binlog_segments(spark, staging, N_EVENTS, N_URLS)

    # wave 1: the pre-widen epochs (no fetch_status; fetch_status int)
    for p in paths[:2]:
        os.rename(p, os.path.join(cfg.source_dir, os.path.basename(p)))
    eng = run_stream(spark, cfg)
    assert isinstance(eng.table.schema()["fetch_status"].dataType,
                      T.IntegerType)

    # wave 2: the widened epoch lands; same entry point, no explicit schema
    os.rename(paths[2], os.path.join(cfg.source_dir,
                                     os.path.basename(paths[2])))
    engine = run_stream(spark, cfg)
    assert isinstance(engine.table.schema()["fetch_status"].dataType,
                      T.LongType)

    ref = _normalize(replay_reference(binlog(spark, N_EVENTS, N_URLS).toPandas()))
    got = _normalize(engine.table.read().toPandas())
    got["fetch_status"] = got["fetch_status"].astype("Int64")
    ref["fetch_status"] = ref["fetch_status"].astype("Int64")
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
