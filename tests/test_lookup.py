"""Point lookup with bucket pruning on the snapshot table."""

from __future__ import annotations

from hyped_spark.plans.replay import ReplayConfig, ReplayEngine
from hyped_spark.sources.synthetic import binlog


def _build(spark, tmp_path, **cfg):
    eng = ReplayEngine(
        spark,
        ReplayConfig(table_path=str(tmp_path / "t"),
                     metrics_path=str(tmp_path / "m"),
                     batch_lsns=400, n_buckets=16, n_salt=2, **cfg),
    )
    eng.replay(binlog(spark, 1200, 150))
    return eng.table


def test_lookup_matches_full_read(spark, tmp_path):
    t = _build(spark, tmp_path)
    full = {r.url: r.lsn for r in t.read().collect()}
    keys = sorted(full)[:5] + ["https://nope.example.com/missing"]
    got = {r.url: r.lsn for r in t.lookup(keys).collect()}
    assert got == {k: full[k] for k in keys if k in full}


def test_lookup_prunes_buckets(spark, tmp_path):
    """The lookup scan must touch only the pruned buckets' files — a
    strict subset of the full read at 16 buckets and few keys."""
    t = _build(spark, tmp_path)
    key = sorted(r.url for r in t.read().collect())[0]
    looked = set(t.lookup([key]).inputFiles())
    everything = set(t.read().inputFiles())
    assert looked and looked < everything
    assert len(looked) <= len(everything) / 4  # 1 key -> 1 of 16 buckets


def test_lookup_resolves_mor_and_tombstones(spark, tmp_path):
    t = _build(spark, tmp_path, merge_mode="mor")
    full = {r.url: r.lsn for r in t.read().collect()}
    keys = sorted(full)[:4]
    got = {r.url: r.lsn for r in t.lookup(keys).collect()}
    assert got == {k: full[k] for k in keys}
    # a deleted key stays invisible through the pruned path
    gone = sorted(set(r.url for r in binlog(spark, 1200, 150)
                      .filter("op = 'delete'").collect()) - set(full))
    if gone:
        assert t.lookup([gone[0]]).count() == 0


def test_lookup_time_travel_and_empty_args(spark, tmp_path):
    import pytest

    t = _build(spark, tmp_path)
    old = {r.url: r.lsn for r in t.read(version=1).collect()}
    k = sorted(old)[0]
    assert t.lookup([k], version=1).collect()[0].lsn == old[k]
    with pytest.raises(ValueError):
        t.lookup([])
