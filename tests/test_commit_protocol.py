"""Snapshot-log commit protocol: atomicity, single-winner, guard math."""

from __future__ import annotations

import pytest

from hyped_spark.lake.table import SnapshotTable
from hyped_spark.plans.replay import target_schema


def test_concurrent_commit_single_winner(spark, tmp_path):
    """Two writers racing to the same version: exactly one commit survives
    (os.link 'x'-semantics publish)."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.init_empty(target_schema())
    payload = t.current_commit()
    payload = dict(payload, snapshot_id=1, parent=0)
    t._commit(1, payload)
    with pytest.raises(FileExistsError):
        t._commit(1, payload)  # the losing writer fails loudly, log intact
    assert t.current_version() == 1


def test_salted_pre_reduce_equivalence(spark, tmp_path):
    """pre_reduce='salted' (the hot-key escape hatch) must produce the same
    final state as the default single-sort path, with raw lineage counts."""
    from hyped_spark.sources.synthetic import binlog

    # hot_pct=60 on 2 urls: a genuinely skewed batch
    log = binlog(spark, 600, 40, hot_urls=2, hot_pct=60)
    a = SnapshotTable(spark, str(tmp_path / "a"), n_buckets=4)
    a.init_empty(target_schema())
    sa = a.merge_events(log, batch_id=0)
    b = SnapshotTable(spark, str(tmp_path / "b"), n_buckets=4)
    b.init_empty(target_schema())
    sb = b.merge_events(log, batch_id=0, pre_reduce="salted")

    assert sb.rows_in_batch == sa.rows_in_batch == 600  # raw lineage
    assert sb.bucket_rows == sa.bucket_rows
    ra = a.read().orderBy("url").toPandas()
    rb = b.read().orderBy("url").toPandas()
    assert ra.equals(rb)

    with pytest.raises(ValueError, match="pre_reduce"):
        a.merge_events(log, batch_id=1, pre_reduce="bogus")


def test_guard_watermarks_monotone(spark, tmp_path):
    """Summary lsn_max / batch_id are high-watermarks: they never move
    backwards even when epochs commit out of LSN order."""
    from hyped_spark.sources.synthetic import binlog

    t = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.init_empty(target_schema())
    log = binlog(spark, 300, 30)
    from hyped_spark.plans.replay import build_merge_source

    # later LSN range first (out-of-order delivery), batch-id guard
    hi = build_merge_source(log.filter("lsn >= 200"))
    lo = build_merge_source(log.filter("lsn < 100"))
    s1 = t.merge_batch(hi, batch_id=0, guard="batch_id")
    assert not s1.skipped_replay
    s2 = t.merge_batch(lo, batch_id=1, guard="batch_id")
    assert not s2.skipped_replay, "earlier-LSN epoch must still apply"
    c = t.current_commit()
    assert int(c["summary"]["lsn_max"]) == 299  # watermark didn't regress
    assert int(c["summary"]["batch_id"]) == 1

    # replayed epoch (same batch id) is a no-op
    s3 = t.merge_batch(lo, batch_id=1, guard="batch_id")
    assert s3.skipped_replay

    # delete-then-stale-update commutativity via tombstones:
    # a delete applied in one epoch beats a lower-LSN update arriving later
    mid_del = build_merge_source(
        log.filter("lsn >= 100 and lsn < 200 and op = 'delete'"))
    t.merge_batch(mid_del, batch_id=2, guard="batch_id")
    visible = {r.url: r.lsn for r in t.read().collect()}
    deleted_urls = [r.url for r in mid_del.select("url").collect()]
    for u in deleted_urls:
        if u in visible:
            # only visible if a HIGHER-lsn upsert won — never a lower one
            assert visible[u] >= 100


def test_current_version_single_listdir_per_lifetime(spark, tmp_path, monkeypatch):
    """The commit-log max version is cached: a whole replay (init + N
    merges, each consulting the version repeatedly) scans the log directory
    exactly once per SnapshotTable lifetime; _commit advances the cache."""
    import os as _os

    from hyped_spark.lake import table as table_mod
    from hyped_spark.plans.replay import ReplayConfig, ReplayEngine
    from hyped_spark.sources.synthetic import binlog

    calls = {"n": 0}
    real = _os.listdir

    def counting(p="."):
        if table_mod._LOG_DIR in str(p):
            calls["n"] += 1
        return real(p)

    monkeypatch.setattr(table_mod.os, "listdir", counting)
    eng = ReplayEngine(spark, ReplayConfig(
        table_path=str(tmp_path / "t"), metrics_path=str(tmp_path / "m"),
        batch_lsns=300, n_buckets=4))
    stats = eng.replay(binlog(spark, 900, 40))
    assert sum(not s.skipped_replay for s in stats) == 3
    assert calls["n"] == 1, f"log dir scanned {calls['n']} times"
    # a fresh handle on the same path still sees the committed state
    t2 = table_mod.SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    assert t2.current_version() == eng.table.current_version()


def test_refresh_observes_other_handle_commits(spark, tmp_path):
    """ADVICE r3: a long-lived read-only handle keeps a stable cached view;
    refresh() rescans the log and picks up commits made through another
    handle (writers always see their own via _commit advancing the cache)."""
    from hyped_spark.lake.table import SnapshotTable
    from hyped_spark.plans.replay import ReplayEngine, target_schema

    writer = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    writer.init_empty(target_schema())
    reader = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    v0 = reader.current_version()

    schema = ("url string, lsn long, warc_ts timestamp, html binary, "
              "lang string, op string")
    ev = spark.createDataFrame(
        [("a", 1, None, b"<html><body>x</body></html>", "en", "upsert")],
        schema,
    )
    writer.merge_events(ev, batch_id=0,
                        transform=ReplayEngine._extract_transform)
    # cached view: the reader handle does NOT see the new commit...
    assert reader.current_version() == v0
    # ...until it refreshes (returns the new version, then read() sees it)
    assert reader.refresh() == writer.current_version() > v0
    assert reader.read().count() == 1
