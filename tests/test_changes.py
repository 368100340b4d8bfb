"""Snapshot-to-snapshot change feed (Delta CDF analogue) with bucket
pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from hyped_spark.plans.replay import ReplayConfig, ReplayEngine
from hyped_spark.sources.synthetic import binlog


def _build(spark, tmp_path, **cfg):
    eng = ReplayEngine(
        spark,
        ReplayConfig(table_path=str(tmp_path / "t"),
                     metrics_path=str(tmp_path / "m"),
                     batch_lsns=400, n_buckets=8, n_salt=2, **cfg),
    )
    eng.replay(binlog(spark, 1200, 120))
    return eng.table


def _brute_diff(t, v1, v2):
    old = {r.url: r.asDict() for r in t.read(version=v1).collect()}
    new = {r.url: r.asDict() for r in t.read(version=v2).collect()}
    out = {}
    for k in new.keys() - old.keys():
        out[k] = "insert"
    for k in old.keys() - new.keys():
        out[k] = "delete"
    for k in new.keys() & old.keys():
        if new[k] != old[k]:
            out[k] = "update_postimage"
    return out


def test_changes_match_brute_state_diff(spark, tmp_path):
    t = _build(spark, tmp_path)
    v2 = t.current_version()
    for v1 in (1, v2 - 1):
        exp = _brute_diff(t, v1, v2)
        got = {r.url: r._change_type for r in t.changes(v1, v2).collect()}
        assert got == exp, (v1, v2)
    # post-image values for updates/inserts, pre-image for deletes
    rows = {r.url: r for r in t.changes(1, v2).collect()}
    new = {r.url: r for r in t.read().collect()}
    old = {r.url: r for r in t.read(version=1).collect()}
    for k, r in rows.items():
        src = new[k] if r._change_type != "delete" else old[k]
        assert r.lsn == src.lsn and r.text == src.text, k


def test_changes_empty_when_same_version(spark, tmp_path):
    t = _build(spark, tmp_path)
    v = t.current_version()
    assert t.changes(v, v).count() == 0


def test_changes_prune_to_touched_buckets(spark, tmp_path):
    """A 1-key merge rewrites 1 of 8 buckets; the change feed must scan a
    strict subset of the table's files and report exactly that key."""
    t = _build(spark, tmp_path)
    v1 = t.current_version()
    log = binlog(spark, 1200, 120)
    k = sorted(r.url for r in t.read().collect())[0]
    ev = (log.filter(F.col("url") == k)
          .orderBy(F.col("lsn").desc()).limit(1)
          .withColumn("lsn", F.lit(1_000_000))
          .withColumn("op", F.lit("update")))
    t.merge_events(ev, batch_id=999)
    feed = t.changes(v1)
    assert [(r.url, r._change_type, r.lsn) for r in feed.collect()] == \
        [(k, "update_postimage", 1_000_000)]
    assert set(feed.inputFiles()) < (
        set(t.read().inputFiles()) | set(t.read(version=v1).inputFiles())
    )


def test_changes_on_mor_table(spark, tmp_path):
    t = _build(spark, tmp_path, merge_mode="mor")
    v2 = t.current_version()
    exp = _brute_diff(t, 1, v2)
    got = {r.url: r._change_type for r in t.changes(1, v2).collect()}
    assert got == exp


def test_changes_bad_range(spark, tmp_path):
    import pytest

    t = _build(spark, tmp_path)
    with pytest.raises(ValueError):
        t.changes(5, 2)


def test_sync_from_materializes_downstream_table(spark, tmp_path):
    """Derived-table maintenance: dst.sync_from(src, since) converges dst
    to src by applying only the pruned change feed, idempotently."""
    from hyped_spark.lake.table import SnapshotTable

    log = binlog(spark, 1200, 120)
    eng = ReplayEngine(
        spark,
        ReplayConfig(table_path=str(tmp_path / "a"),
                     metrics_path=str(tmp_path / "m"),
                     batch_lsns=400, n_buckets=8, n_salt=2),
    )
    # apply only the first two batches for the initial sync point
    eng.replay(log.filter(F.col("lsn") < 800))
    a = eng.table
    b = SnapshotTable(spark, str(tmp_path / "b"), n_buckets=4)

    stats = b.sync_from(a, since_version=0)
    assert stats is not None and stats.rows_upserted > 0
    v_synced = a.current_version()

    def state(t):
        return sorted(map(tuple, t.read().collect()))

    assert state(b) == state(a)

    # more changes land in src; the second sync applies only the delta
    eng.replay(log)
    stats2 = b.sync_from(a, since_version=v_synced)
    assert stats2 is not None
    assert state(b) == state(a)
    # deletes propagated: keys removed from src are gone downstream
    assert {r.url for r in b.read().collect()} == \
        {r.url for r in a.read().collect()}

    # re-syncing the same source version is a guarded no-op
    stats3 = b.sync_from(a, since_version=v_synced)
    assert stats3 is None or stats3.skipped_replay
