"""Snapshot expiry + compaction (Iceberg-parity table maintenance)."""

from __future__ import annotations

import os

import pandas as pd

from hyped_spark.plans.replay import ReplayConfig, ReplayEngine
from hyped_spark.sources.synthetic import binlog

from tests.replayer import replay_reference


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
