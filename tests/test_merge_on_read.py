"""Merge-on-read mode: fragment appends, read-side LWW, compaction, interop.

MOR is the write-amplification dial for update-heavy streams: a batch
appends its winners as a new fragment per bucket instead of rewriting the
bucket (SnapshotTable.merge_events(merge_mode="mor")); reads resolve LWW
across fragments until compact() folds them back.
"""

from __future__ import annotations

import pandas as pd
import pytest

from hyped_spark.plans.replay import ReplayConfig, ReplayEngine
from hyped_spark.sources.synthetic import binlog

from tests.replayer import replay_reference

N_EVENTS = 1_000
N_URLS = 80


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = [c for c in ["url", "lsn", "warc_ts", "html", "text", "lang", "fetch_status"]
            if c in pdf.columns]
    out = pdf[cols].sort_values("url").reset_index(drop=True)
    if "fetch_status" in out.columns:
        out["fetch_status"] = out["fetch_status"].astype("Int64")
    return out


def _engine(spark, path, mode: str, batch_lsns: int = 250) -> ReplayEngine:
    return ReplayEngine(spark, ReplayConfig(
        table_path=str(path / f"t_{mode}"), metrics_path=str(path / f"m_{mode}"),
        batch_lsns=batch_lsns, n_buckets=8, n_salt=4, merge_mode=mode,
    ))


def test_mor_replay_matches_reference_and_cow(spark, tmp_path):
    log = binlog(spark, N_EVENTS, N_URLS)
    mor = _engine(spark, tmp_path, "mor")
    mor.replay(log)
    cow = _engine(spark, tmp_path, "cow")
    cow.replay(log)

    ref = _normalize(replay_reference(binlog(spark, N_EVENTS, N_URLS).toPandas()))
    got_mor = _normalize(mor.table.read().toPandas())
    got_cow = _normalize(cow.table.read().toPandas())
    pd.testing.assert_frame_equal(got_mor, ref, check_dtype=False)
    pd.testing.assert_frame_equal(got_mor, got_cow, check_dtype=False)

    # fragments actually accumulated (that's the point: no rewrite)
    c = mor.table.current_commit()
    assert any(len(mor.table._frags(i)) > 1 for i in c["buckets"].values())

    # idempotence: full duplicate delivery is a no-op (no fragment growth)
    v = mor.table.current_version()
    assert all(s.skipped_replay for s in mor.replay(log))
    assert mor.table.current_version() == v


def test_mor_compact_folds_fragments(spark, tmp_path):
    log = binlog(spark, N_EVENTS, N_URLS)
    eng = _engine(spark, tmp_path, "mor")
    eng.replay(log)
    before = _normalize(eng.table.read().toPandas())
    eng.table.compact()
    c = eng.table.current_commit()
    assert all(len(eng.table._frags(i)) == 1 for i in c["buckets"].values())
    assert not eng.table._needs_resolve(c)  # reads are scan-only again
    after = _normalize(eng.table.read().toPandas())
    pd.testing.assert_frame_equal(before, after, check_dtype=False)


def test_cow_merge_compacts_touched_mor_buckets(spark, tmp_path):
    """Mode interop: a COW merge over a fragmented table resolves all
    fragment rows of the buckets it touches and replaces their fragments."""
    log = binlog(spark, N_EVENTS, N_URLS)
    eng = _engine(spark, tmp_path, "mor")
    first = [s for s in eng.replay(log.filter("lsn < 750"))]
    assert sum(not s.skipped_replay for s in first) == 3
    # apply the tail with a COW merge on the same table (same transform slot)
    tail = log.filter("lsn >= 750")
    eng.table.merge_events(tail, batch_id=3, merge_mode="cow",
                           transform=ReplayEngine._extract_transform)

    ref = _normalize(replay_reference(binlog(spark, N_EVENTS, N_URLS).toPandas()))
    got = _normalize(eng.table.read().toPandas())
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    # touched buckets are back to one fragment
    c = eng.table.current_commit()
    touched = {str(b) for b in range(8)}  # small log touches all buckets
    assert all(len(eng.table._frags(c["buckets"][b])) == 1
               for b in touched if b in c["buckets"])


def test_mor_equal_ord_tie_resolves_to_newest_fragment(spark, tmp_path):
    """Duplicate (key, ord) events delivered in different epochs with
    DIFFERENT payloads (possible under guard='batch_id') must resolve to
    the newest fragment — deterministically, on every scan."""
    from hyped_spark.lake.table import SnapshotTable
    from hyped_spark.plans.replay import target_schema

    t = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.init_empty(target_schema())
    schema = "url string, lsn long, warc_ts timestamp, html binary, lang string, op string"
    e0 = spark.createDataFrame(
        [("a", 10, None, b"<html><body>first epoch</body></html>", "en", "upsert")],
        schema,
    )
    e1 = spark.createDataFrame(
        [("a", 10, None, b"<html><body>second epoch</body></html>", "en", "upsert")],
        schema,
    )
    t.merge_events(e0, batch_id=0, guard="batch_id", merge_mode="mor",
                   transform=ReplayEngine._extract_transform)
    t.merge_events(e1, batch_id=1, guard="batch_id", merge_mode="mor",
                   transform=ReplayEngine._extract_transform)
    assert t._needs_resolve(t.current_commit())
    first = t.read().collect()
    assert len(first) == 1 and "second epoch" in first[0].text
    # stable across scans of the same snapshot
    assert [tuple(r) for r in t.read().collect()] == [tuple(r) for r in first]


def test_mor_rejects_unknown_mode(spark, tmp_path):
    from hyped_spark.lake.table import SnapshotTable
    from hyped_spark.plans.replay import target_schema

    t = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.init_empty(target_schema())
    with pytest.raises(ValueError, match="merge_mode"):
        t.merge_events(binlog(spark, 10, 5), batch_id=0, merge_mode="nope")


def test_mor_tie_break_immune_to_snaplike_root_dir(spark, tmp_path):
    """ADVICE r3: the fragment ordinal is parsed with a regex ANCHORED to
    the table's own data/snapNNNNNNNNNN/ layout — a table rooted under a
    directory that itself matches 'snap<digits>' must still resolve
    equal-ord ties to the newest fragment (the unanchored pattern matched
    the root and gave every fragment the same constant ordinal)."""
    from hyped_spark.lake.table import SnapshotTable
    from hyped_spark.plans.replay import target_schema

    root = tmp_path / "snap2026081700" / "t"
    t = SnapshotTable(spark, str(root), n_buckets=4)
    t.init_empty(target_schema())
    schema = ("url string, lsn long, warc_ts timestamp, html binary, "
              "lang string, op string")
    e0 = spark.createDataFrame(
        [("a", 10, None, b"<html><body>first epoch</body></html>", "en", "upsert")],
        schema,
    )
    e1 = spark.createDataFrame(
        [("a", 10, None, b"<html><body>second epoch</body></html>", "en", "upsert")],
        schema,
    )
    t.merge_events(e0, batch_id=0, guard="batch_id", merge_mode="mor",
                   transform=ReplayEngine._extract_transform)
    t.merge_events(e1, batch_id=1, guard="batch_id", merge_mode="mor",
                   transform=ReplayEngine._extract_transform)
    rows = t.read().collect()
    assert len(rows) == 1 and "second epoch" in rows[0].text
