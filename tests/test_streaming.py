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


def test_windowed_counts_watermark_bounds_state(spark, tmp_path):
    """Event-time windowed metric: append-mode, each window emits exactly
    once when the watermark passes its end, counts are exact, and closed
    windows are EVICTED — final state holds only the open window(s)."""
    import os
    from datetime import datetime

    from hyped_spark.streaming.metrics import windowed_event_counts

    src = tmp_path / "segs"
    src.mkdir()

    def seg(name, ts_list, mtime):
        df = spark.createDataFrame(
            [(datetime(2024, 1, 1, *t), 1) for t in ts_list],
            "ts timestamp, v long",
        )
        p = str(src / name)
        df.coalesce(1).write.parquet(p)
        os.utime(p, (mtime, mtime))
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (mtime, mtime))
        return p

    # batch 1: six events in 10:00, one in 10:01
    seg("seg0", [(10, 0, s) for s in (1, 5, 10, 20, 40, 59)] + [(10, 1, 10)],
        1_000)
    # batch 2: one event LATER than the watermark (09:55 < 09:59:10) — per
    # Spark's one-sided guarantee it surfaces as a small late window — and
    # one on-time event in 10:01
    seg("seg1", [(9, 55, 0), (10, 1, 30)], 2_000)
    # batch 3: far-future event pushes the watermark past every window
    seg("seg2", [(11, 30, 0)], 3_000)

    stream = (
        spark.readStream.schema("ts timestamp, v long")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src) + "/seg*")
    )
    q = (
        windowed_event_counts(stream, "ts", "1 minute", "2 minutes")
        .writeStream.format("memory").queryName("wincounts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    all_rows = spark.sql("select * from wincounts").collect()
    rows = {r.win_start.strftime("%H:%M"): r.n for r in all_rows}
    # exact counts, each window emitted exactly once
    assert len(all_rows) == len(rows)
    assert rows == {"09:55": 1, "10:00": 6, "10:01": 2}
    # bounded state: every emitted window was evicted — only the still-open
    # 11:30 window remains in the state store
    state = q.recentProgress[-1]["stateOperators"][0]
    assert state["numRowsTotal"] == 1, state
