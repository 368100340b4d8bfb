"""Snapshot expiry + compaction (Iceberg-parity table maintenance)."""

from __future__ import annotations

import os

import pandas as pd

from hyped_spark.plans.replay import ReplayConfig, ReplayEngine
from hyped_spark.sources.synthetic import binlog

from tests.replayer import replay_reference


def test_rollback(spark, tmp_path):
    """Rollback re-points the table at an earlier snapshot via a NEW commit;
    the watermark reverts, so replay re-applies the rolled-back range."""
    import pytest

    log = binlog(spark, 800, 60)
    eng = ReplayEngine(
        spark,
        ReplayConfig(table_path=str(tmp_path / "t"), metrics_path=str(tmp_path / "m"),
                     batch_lsns=200, n_buckets=4, n_salt=4),
    )
    eng.replay(log)
    t = eng.table
    v_mid = 2  # state after batch 1 (v0 = create, v1/v2 = batches 0/1)
    mid_state = t.read(version=v_mid).orderBy("url").toPandas()
    v_final = t.current_version()
    final_state = t.read().orderBy("url").toPandas()

    v_rb = t.rollback(v_mid)
    assert v_rb == v_final + 1  # append-only history
    assert t.read().orderBy("url").toPandas().equals(mid_state)
    assert t.last_committed_lsn() == 399  # watermark reverted with it

    # replaying the log re-applies batches 2..3 and converges to final state
    eng.replay(log)
    assert t.read().orderBy("url").toPandas().equals(final_state)

    with pytest.raises(ValueError):
        t.rollback(10_000)


def test_expire_and_compact(spark, tmp_path):
    log = binlog(spark, 1_000, 80)
    eng = ReplayEngine(
        spark,
        ReplayConfig(table_path=str(tmp_path / "t"), metrics_path=str(tmp_path / "m"),
                     batch_lsns=250, n_buckets=4, n_salt=4),
    )
    eng.replay(log)
    before = (
        eng.table.read().toPandas().sort_values("url").reset_index(drop=True)
    )
    v = eng.table.current_version()
    data_dirs = os.listdir(str(tmp_path / "t" / "data"))
    assert len(data_dirs) >= 4  # one per merge snapshot

    # compact: single snapshot, tombstones GC'd, same visible state
    eng.table.compact()
    after = eng.table.read().toPandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after, check_dtype=False)
    assert eng.table.current_version() == v + 1

    # expire: only the compacted snapshot's data remains on disk
    removed = eng.table.expire_snapshots(keep_last=1)
    assert removed >= 4
    remaining = os.listdir(str(tmp_path / "t" / "data"))
    assert len(remaining) == 1
    again = eng.table.read().toPandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, again, check_dtype=False)

    # metrics/lineage invariants helper still consistent post-compaction
    from hyped_spark.streaming.metrics import lineage_check
    chk = lineage_check(eng.metrics())
    assert chk["ranges_ordered_non_overlapping"]

    # replay-equivalence unaffected
    ref = replay_reference(binlog(spark, 1_000, 80).toPandas())
    cols = ["url", "lsn", "text"]
    e = again[cols].reset_index(drop=True)
    r = ref.sort_values("url")[cols].reset_index(drop=True)
    pd.testing.assert_frame_equal(e, r, check_dtype=False)


def test_compact_preserves_committed_buckets_and_rebuckets_on_request(spark, tmp_path):
    """A handle constructed with a mismatched n_buckets must NOT silently
    rebucket on compact; an explicit compact(n_buckets=...) rebuckets the
    whole table and later merges follow the new layout."""
    from hyped_spark.lake.table import SnapshotTable
    from hyped_spark.plans.replay import ReplayConfig, ReplayEngine
    from hyped_spark.sources.synthetic import binlog

    eng = ReplayEngine(spark, ReplayConfig(
        table_path=str(tmp_path / "t"), metrics_path=str(tmp_path / "m"),
        batch_lsns=400, n_buckets=4))
    eng.replay(binlog(spark, 600, 60))
    before = eng.table.read().orderBy("url").toPandas()

    # mismatched handle: compact keeps the COMMITTED count (4)
    stale = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=16)
    stale.compact()
    c = stale.current_commit()
    assert c["n_buckets"] == 4
    assert stale.read().orderBy("url").toPandas().equals(before)

    # explicit rebucket for growth: same rows, new layout, merges follow
    stale.compact(n_buckets=8)
    c = stale.current_commit()
    assert c["n_buckets"] == 8
    assert len(c["buckets"]) <= 8
    assert stale.read().orderBy("url").toPandas().equals(before)
    eng2 = ReplayEngine(spark, ReplayConfig(
        table_path=str(tmp_path / "t"), metrics_path=str(tmp_path / "m"),
        batch_lsns=400, n_buckets=4))  # stale config; merge syncs from commit
    stats = eng2.replay(binlog(spark, 1000, 60))
    assert any(not s.skipped_replay for s in stats)
    assert eng2.table.current_commit()["n_buckets"] == 8


def test_vacuum_removes_orphans_keeps_history(spark, tmp_path):
    """vacuum() deletes only never-committed data dirs (crashed merges);
    every live snapshot — including old ones — still reads."""
    import time

    from hyped_spark.plans.replay import ReplayConfig, ReplayEngine

    eng = ReplayEngine(
        spark,
        ReplayConfig(table_path=str(tmp_path / "t"),
                     metrics_path=str(tmp_path / "m"),
                     batch_lsns=300, n_buckets=4, n_salt=2),
    )
    eng.replay(binlog(spark, 900, 80))
    t = eng.table
    states = {v: t.read(version=v).count() for v in range(1, t.current_version() + 1)}

    # simulate a crashed merge: a data dir that no commit references
    orphan = tmp_path / "t" / "data" / "snap9999999999"
    (orphan / "__bucket=0").mkdir(parents=True)
    (orphan / "__bucket=0" / "junk.parquet").write_bytes(b"not parquet")

    # the DEFAULT grace period (1 h) protects a freshly written
    # (possibly in-flight) dir — deleting needs an explicit opt-in
    assert t.vacuum() == 0
    assert orphan.exists()

    time.sleep(0.01)
    assert t.vacuum(grace_seconds=0) == 1
    assert not orphan.exists()
    assert t.vacuum(grace_seconds=0) == 0  # idempotent

    # full time travel still works after the vacuum
    for v, n in states.items():
        assert t.read(version=v).count() == n, v
