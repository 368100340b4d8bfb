"""Replay-equivalence: engine's final table state ≡ reference replayer.

The north-rule acceptance test (BASELINE.json): full-log replay through the
LSN-chunked merge engine must produce exactly the reference's final state,
including byte-identical extracted `text` per url, across insert / update /
delete / re-insert, hot-key skew, and schema evolution (column add +
int→long widen mid-log).
"""

from __future__ import annotations

import pandas as pd
import pytest

from hyped_spark.plans.replay import ReplayConfig, ReplayEngine
from hyped_spark.sources.synthetic import binlog, binlog_segments

from tests.replayer import replay_reference

N_EVENTS = 2_000
N_URLS = 150


@pytest.fixture(scope="module")
def log_pdf(spark) -> pd.DataFrame:
    return binlog(spark, N_EVENTS, N_URLS).toPandas()


def _engine_state(spark, tmp_path, batch_lsns: int, log_df) -> pd.DataFrame:
    eng = ReplayEngine(
        spark,
        ReplayConfig(
            table_path=str(tmp_path / "table"),
            metrics_path=str(tmp_path / "metrics"),
            batch_lsns=batch_lsns,
            n_buckets=8,
            n_salt=4,
        ),
    )
    stats = eng.replay(log_df)
    assert stats, "no batches applied"
    return eng.table.read().toPandas(), eng, stats


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = ["url", "lsn", "warc_ts", "html", "text", "lang", "fetch_status"]
    cols = [c for c in cols if c in pdf.columns]
    out = pdf[cols].sort_values("url").reset_index(drop=True)
    return out


def test_replay_matches_reference(spark, tmp_path, log_pdf):
    log_df = binlog(spark, N_EVENTS, N_URLS)
    engine_pdf, eng, stats = _engine_state(spark, tmp_path, 500, log_df)
    ref_pdf = replay_reference(log_pdf)

    e, r = _normalize(engine_pdf), _normalize(ref_pdf)
    assert len(e) == len(r), f"row count {len(e)} != {len(r)}"
    assert list(e.columns) == list(r.columns)
    # fetch_status dtype: engine long vs replayer object/float — align
    if "fetch_status" in e.columns:
        e["fetch_status"] = e["fetch_status"].astype("Int64")
        r["fetch_status"] = r["fetch_status"].astype("Int64")
    pd.testing.assert_frame_equal(e, r, check_dtype=False)

    # byte-identical text per url, explicitly
    et = dict(zip(e["url"], e["text"]))
    rt = dict(zip(r["url"], r["text"]))
    assert et == rt

    # schema evolved: fetch_status present and long, with >int32 values
    assert "fetch_status" in e.columns
    assert e["fetch_status"].dropna().max() > 2**31

    # lineage: metrics rows exist, lsn ranges non-overlapping and ordered
    m = eng.metrics().toPandas().sort_values(["batch_id", "partition_id"])
    per_batch = m.groupby("batch_id").agg(lsn_min=("lsn_min", "first"),
                                          lsn_max=("lsn_max", "first"))
    prev_max = -1
    for _, row in per_batch.iterrows():
        assert row.lsn_min > prev_max
        prev_max = row.lsn_max
    # per-partition rows_applied sums to total ingested change events
    total_applied = int(m[m.partition_id >= 0]["rows_applied"].sum())
    assert total_applied == sum(s.rows_in_batch for s in stats if not s.skipped_replay)
    assert total_applied == N_EVENTS


def test_batch_size_invariance(spark, tmp_path, log_pdf):
    """Final state must not depend on microbatch boundaries."""
    log_df = binlog(spark, N_EVENTS, N_URLS)
    one, _, _ = _engine_state(spark, tmp_path / "a", 10_000, log_df)  # single batch
    many, _, _ = _engine_state(spark, tmp_path / "b", 137, log_df)    # odd-sized batches
    pd.testing.assert_frame_equal(_normalize(one), _normalize(many), check_dtype=False)


def test_idempotent_replay_and_resume(spark, tmp_path, log_pdf):
    """Re-running the same log (duplicate delivery of every batch) is a no-op."""
    log_df = binlog(spark, N_EVENTS, N_URLS)
    first, eng, _ = _engine_state(spark, tmp_path, 500, log_df)
    v_before = eng.table.current_version()
    stats2 = eng.replay(log_df)  # full duplicate delivery
    assert all(s.skipped_replay for s in stats2)
    assert eng.table.current_version() == v_before
    pd.testing.assert_frame_equal(
        _normalize(eng.table.read().toPandas()), _normalize(first), check_dtype=False
    )


def test_derived_columns_values(spark, tmp_path, log_pdf):
    """derived_columns=True: the ingest-time analysis columns must equal the
    same native functions applied to the final table's text after the fact."""
    from pyspark.sql import functions as F

    from hyped_spark.functions.text import (
        fingerprint_col, lang_id_col, quality_score_col, token_count_col,
    )

    log_df = binlog(spark, 800, 60)
    eng = ReplayEngine(
        spark,
        ReplayConfig(
            table_path=str(tmp_path / "t"), metrics_path=str(tmp_path / "m"),
            batch_lsns=300, n_buckets=8, n_salt=4, derived_columns=True,
        ),
    )
    eng.replay(log_df)
    t = eng.table.read()
    assert {"fingerprint", "quality", "n_tokens", "lang_guess"} <= set(t.columns)
    mism = t.filter(
        (F.col("fingerprint") != fingerprint_col(F.col("text")))
        | (F.col("quality") != quality_score_col(F.col("text")))
        | (F.col("n_tokens") != token_count_col(F.col("text")).cast("int"))
        | (F.col("lang_guess") != lang_id_col(F.col("text")))
    ).count()
    assert mism == 0
    assert t.filter(F.col("fingerprint").isNull() & F.col("text").isNotNull()).count() == 0


def test_precomputed_meta_matches_internal(spark, tmp_path, log_pdf):
    """replay()'s single upfront lineage job must yield batch stats identical
    to merge_events' own per-batch meta aggregation."""
    from hyped_spark.lake.table import SnapshotTable
    from hyped_spark.plans.replay import target_schema

    log_df = binlog(spark, 1_000, 80)
    eng = ReplayEngine(
        spark,
        ReplayConfig(
            table_path=str(tmp_path / "a"), metrics_path=str(tmp_path / "am"),
            batch_lsns=300, n_buckets=8, n_salt=4,
        ),
    )
    via_replay = eng.replay(log_df)

    manual_table = SnapshotTable(spark, str(tmp_path / "b"), n_buckets=8)
    manual_table.init_empty(target_schema())
    manual = []
    for k in range(4):
        batch = log_df.filter(f"lsn >= {k * 300} and lsn < {(k + 1) * 300}")
        manual.append(manual_table.merge_events(batch, batch_id=k))
    for a, b in zip(via_replay, manual):
        assert (a.lsn_min, a.lsn_max, a.rows_in_batch, a.buckets_touched) == \
               (b.lsn_min, b.lsn_max, b.rows_in_batch, b.buckets_touched)
        assert a.bucket_rows == b.bucket_rows


def test_crash_resume_mid_log(spark, tmp_path, log_pdf):
    """Apply the first half, 'crash', resume with the full log → same state."""
    log_df = binlog(spark, N_EVENTS, N_URLS)
    half = log_df.filter("lsn < 900")
    eng = ReplayEngine(
        spark,
        ReplayConfig(table_path=str(tmp_path / "t"), metrics_path=str(tmp_path / "m"),
                     batch_lsns=400, n_buckets=8, n_salt=4),
    )
    eng.replay(half)
    assert eng.table.last_committed_lsn() == 899
    # new engine instance = restart; resumes from committed lsn
    eng2 = ReplayEngine(
        spark,
        ReplayConfig(table_path=str(tmp_path / "t"), metrics_path=str(tmp_path / "m"),
                     batch_lsns=400, n_buckets=8, n_salt=4),
    )
    eng2.replay(log_df)
    ref = replay_reference(log_pdf)
    pd.testing.assert_frame_equal(
        _normalize(eng2.table.read().toPandas()), _normalize(ref), check_dtype=False
    )


def test_schema_evolution_segments(spark, tmp_path):
    """Segments genuinely differ in schema; table schema evolves across merges."""
    segs = binlog_segments(spark, N_EVENTS, N_URLS)
    assert "fetch_status" not in segs[0].columns
    assert dict(segs[1].dtypes)["fetch_status"] == "int"
    assert dict(segs[2].dtypes)["fetch_status"] == "bigint"

    eng = ReplayEngine(
        spark,
        ReplayConfig(table_path=str(tmp_path / "t"), metrics_path=str(tmp_path / "m"),
                     batch_lsns=10_000, n_buckets=8, n_salt=4),
    )
    from hyped_spark.plans.replay import target_schema
    eng.table.init_empty(target_schema())
    for i, seg in enumerate(segs):
        eng.apply_batch(seg, batch_id=i)
    sch = {f.name: f.dataType.simpleString() for f in eng.table.schema().fields}
    assert sch.get("fetch_status") == "bigint"
    # values from both sides of the widen coexist
    fs = eng.table.read().toPandas()["fetch_status"].dropna()
    assert (fs > 2**31).any() and ((fs > 0) & (fs < 2**31)).any()


def test_hot_key_skew_replay_and_balance(spark, tmp_path):
    """Adversarial hot-key fixture: ONE url carries ~10% of all change
    events. The engine must (a) still reproduce the reference replayer's
    final state byte-for-byte and (b) keep the applied-rows distribution
    across bucket partitions balanced — the metrics table's skew_factor
    is the documented proof that the key-partitioned merge does not let a
    hot key dominate a bucket (README: "skew_factor proves balance")."""
    from hyped_spark.streaming.metrics import lineage_check

    log_df = binlog(spark, N_EVENTS, N_URLS, hot_urls=1, hot_pct=10)
    log_pdf = log_df.toPandas()
    # fixture sanity: the hot url really is ~10% of the log
    top = log_pdf["url"].value_counts()
    assert top.iloc[0] >= 0.08 * len(log_pdf), "hot-key fixture not skewed"
    assert top.iloc[0] >= 8 * top.iloc[1], "hot url should dominate raw events"

    engine_pdf, eng, stats = _engine_state(spark, tmp_path, 500, log_df)
    ref_pdf = replay_reference(log_pdf)
    e, r = _normalize(engine_pdf), _normalize(ref_pdf)
    assert len(e) == len(r)
    if "fetch_status" in e.columns:
        e["fetch_status"] = e["fetch_status"].astype("Int64")
        r["fetch_status"] = r["fetch_status"].astype("Int64")
    pd.testing.assert_frame_equal(e, r, check_dtype=False)
    assert dict(zip(e["url"], e["text"])) == dict(zip(r["url"], r["text"]))

    # balance bound: LWW dedup collapses the hot key to ONE winner per
    # batch before the bucket write, so applied rows stay near-uniform
    # over 8 buckets even though raw events are 10%-on-one-key skewed
    chk = lineage_check(eng.metrics())
    assert chk["ranges_ordered_non_overlapping"]
    assert chk["total_rows_applied"] == N_EVENTS
    assert chk["max_skew_factor"] <= 3.0, chk
