"""Offline unit tests for the Iceberg merge backend contract.

No Iceberg catalog exists in the sandbox, so these cover everything that
does not need one: the generated SQL (tombstone semantics — no DELETE
branch), the watermark round-trip (guard reads where merge writes), and
the merge-source construction (LWW dedup + tombstone rows) on plain
DataFrames.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from hyped_spark.lake.iceberg_backend import (
    BATCH_PROP,
    LSN_PROP,
    TOMBSTONE,
    build_merge_source,
    merge_sql,
    read_watermark,
    watermark_sql,
)


def test_merge_sql_preserves_tombstones():
    sql = merge_sql("lake.db.pages", key="url", ord_col="lsn")
    assert "DELETE" not in sql.upper().replace("MERGE", "")
    assert "WHEN MATCHED AND s.lsn > t.lsn THEN UPDATE SET *" in sql
    assert "WHEN NOT MATCHED THEN INSERT *" in sql
    # exactly one MATCHED branch: replaying an applied batch matches every
    # key with s.lsn == t.lsn -> zero effect (idempotence by construction)
    assert sql.count("WHEN MATCHED") == 1


def test_watermark_roundtrip():
    sql = watermark_sql("lake.db.pages", lsn_max=12345, batch_id=7)
    assert LSN_PROP in sql and BATCH_PROP in sql and "12345" in sql
    # guard parses SHOW TBLPROPERTIES rows — the same keys the stamp writes
    rows = [Row(key=LSN_PROP, value="12345"), Row(key=BATCH_PROP, value="7"),
            Row(key="format-version", value="2")]
    assert read_watermark(rows) == (12345, 7)
    assert read_watermark([Row(key="other", value="x")]) == (-1, -1)


def test_evolution_sql():
    from pyspark.sql import types as T

    from hyped_spark.lake.iceberg_backend import evolution_sql
    from hyped_spark.schema import SchemaDiff

    diff = SchemaDiff(
        added=[T.StructField("fetch_status", T.LongType()),
               T.StructField("etag", T.StringType())],
        widened=[("retries", T.IntegerType(), T.LongType())],
    )
    stmts = evolution_sql("lake.db.pages", diff)
    assert stmts == [
        "ALTER TABLE lake.db.pages ADD COLUMNS (fetch_status bigint, etag string)",
        "ALTER TABLE lake.db.pages ALTER COLUMN retries TYPE bigint",
    ]
    assert evolution_sql("t", SchemaDiff()) == []


def test_build_merge_source_lww_and_tombstones(spark):
    events = spark.createDataFrame(
        [
            (1, "insert", "a", "v1"),
            (3, "update", "a", "v3"),
            (2, "update", "a", "v2"),   # loses LWW to lsn=3
            (5, "delete", "b", None),
            (4, "insert", "b", "v4"),   # loses to the delete
            (6, "insert", "c", "v6"),
        ],
        "lsn long, op string, url string, payload string",
    )
    src = build_merge_source(events, op_col="op", key="url", ord_col="lsn")
    rows = {r["url"]: r for r in src.collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"]["lsn"] == 3 and rows["a"]["payload"] == "v3"
    assert rows["a"][TOMBSTONE] is False
    # the delete survives as a tombstone ROW (not dropped) so a replayed or
    # late lower-LSN update cannot resurrect the key
    assert rows["b"]["lsn"] == 5 and rows["b"][TOMBSTONE] is True
    assert rows["c"][TOMBSTONE] is False
    assert "op" not in src.columns


def test_purge_tombstones_sql_respects_watermark():
    from hyped_spark.lake.iceberg_backend import (
        purge_tombstones_sql,
        rewrite_data_files_sql,
    )

    sql = purge_tombstones_sql("lake.db.pages", low_watermark=5000)
    # only APPLIED tombstones strictly below the low watermark are purged:
    # a newer tombstone must stay to suppress late lower-lsn updates
    assert sql == (
        "DELETE FROM lake.db.pages WHERE __tombstone AND lsn < 5000"
    )
    custom = purge_tombstones_sql("lake.db.pages", 7, ord_col="seq")
    assert "seq < 7" in custom and TOMBSTONE in custom
    call = rewrite_data_files_sql("lake.db.pages")
    assert call == (
        "CALL lake.system.rewrite_data_files(table => 'lake.db.pages')"
    )


def test_purge_semantics_on_dataframe(spark):
    """Run the purge predicate itself (as a filter complement) on a plain
    DataFrame: rows the DELETE would remove are exactly the old applied
    tombstones; newer tombstones and all live rows survive."""
    rows = [
        ("a", 10, False),   # live, old
        ("b", 20, True),    # tombstone below watermark -> purged
        ("c", 6000, True),  # tombstone at/above watermark -> kept
        ("d", 5000, True),  # boundary: NOT purged (strict <)
        ("e", 7000, False), # live, new
    ]
    df = spark.createDataFrame(rows, f"url string, lsn long, {TOMBSTONE} boolean")
    low = 5000
    kept = df.filter(~(F.col(TOMBSTONE) & (F.col("lsn") < low)))
    assert {r.url for r in kept.collect()} == {"a", "c", "d", "e"}


def test_zorder_rewrite_sql():
    import pytest

    from hyped_spark.lake.iceberg_backend import zorder_rewrite_sql

    call = zorder_rewrite_sql("lake.db.pages", ["url", "warc_ts"])
    assert call == (
        "CALL lake.system.rewrite_data_files(table => 'lake.db.pages', "
        "strategy => 'sort', sort_order => 'zorder(url, warc_ts)')"
    )
    with pytest.raises(ValueError, match="at least one"):
        zorder_rewrite_sql("lake.db.pages", [])
