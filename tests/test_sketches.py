"""Sketches (HLL, Count-Min) and cross-document line dedup.

Covers: estimator accuracy bounds, exact merge/associativity properties,
DuckDB twin bit-parity in md5 mode (the driver-oracle mechanism), CMS
one-sidedness, and the CCNet line-dedup semantics on crafted fixtures.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hyped_spark.operators.dedup import line_dedup
from hyped_spark.operators.sketches import (
    cms_count_sql,
    cms_estimate,
    cms_merge,
    cms_sketch,
    hll_count_distinct,
    hll_count_distinct_sql,
    hll_merge,
    hll_registers,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- HLL

def test_hll_accuracy_within_3_sigma(spark):
    # 20k distinct among 100k rows; sigma = 1.04/sqrt(4096) ~ 1.6%
    df = spark.range(100_000).select(
        (F.col("id") % 20_000).cast("string").alias("v")
    )
    est = hll_count_distinct(df, "v", p=12).collect()[0]["est_distinct"]
    assert abs(est - 20_000) / 20_000 < 0.05


def test_hll_small_range_linear_counting_is_near_exact(spark):
    # far below 2.5m -> linear counting branch; error ~ 0 at this scale
    df = spark.range(300).select(F.col("id").cast("string").alias("v"))
    est = hll_count_distinct(df, "v", p=12).collect()[0]["est_distinct"]
    assert abs(est - 300) <= 6


def test_hll_merge_equals_whole_sketch(spark):
    df = spark.range(10_000).select(F.col("id").cast("string").alias("v"))
    a = df.filter(F.col("v").cast("long") % 2 == 0)
    b = df.filter(F.col("v").cast("long") % 2 == 1)
    whole = hll_registers(df, "v", p=10)
    merged = hll_merge(hll_registers(a, "v", p=10), hll_registers(b, "v", p=10))
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0


def test_hll_duckdb_twin_bit_parity(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = {
        (r["event_type"], r["est_distinct"])
        for r in hll_count_distinct(
            ev, "user_id", p=10, group_cols=("event_type",), hash_mode="md5"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    want = set(
        con.execute(
            hll_count_distinct_sql(
                "events", "user_id", p=10, group_exprs=("event_type",)
            )
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_hll_rejects_bad_p(spark):
    df = spark.range(1).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match="p must be"):
        hll_registers(df, "v", p=3)


# ---------------------------------------------------------- Count-Min

def test_cms_never_underestimates_and_tight_when_wide(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = {
        r["event_type"]: r["cnt"]
        for r in ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    keys = ev.select("event_type").distinct()
    # narrow sketch: one-sided error
    sk = cms_sketch(ev, "event_type", width=4, depth=2)
    for r in cms_estimate(sk, keys, "event_type", 4, 2).collect():
        assert r["est_count"] >= exact[r["event_type"]]
    # wide sketch: no collisions among a handful of keys -> exact
    skw = cms_sketch(ev, "event_type", width=4096, depth=4)
    for r in cms_estimate(skw, keys, "event_type", 4096, 4).collect():
        assert r["est_count"] == exact[r["event_type"]]


def test_cms_absent_key_estimates_zero_or_collision(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sk = cms_sketch(ev, "event_type", width=4096, depth=4)
    keys = spark.createDataFrame([("never-seen-key",)], "event_type string")
    est = cms_estimate(sk, keys, "event_type", 4096, 4).collect()[0]["est_count"]
    assert est == 0


def test_cms_merge_is_exact_sum(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    whole = cms_sketch(ev, "event_type", width=64, depth=3)
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = cms_merge(
        cms_sketch(a, "event_type", width=64, depth=3),
        cms_sketch(b, "event_type", width=64, depth=3),
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0


def test_cms_duckdb_twin_bit_parity(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sk = cms_sketch(ev, "event_type", width=32, depth=3, hash_mode="md5")
    keys = ev.select("event_type").distinct()
    got = {
        (r["event_type"], r["est_count"])
        for r in cms_estimate(
            sk, keys, "event_type", 32, 3, hash_mode="md5"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = set(
        con.execute(
            cms_count_sql(
                "events", "event_type",
                "SELECT DISTINCT event_type FROM events",
                "event_type", 32, 3,
            )
        ).fetchall()
    )
    assert got == want and len(got) > 0


# ------------------------------------------------------- line dedup

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_drops_cross_doc_boilerplate(spark):
    df = _docs(spark, [
        (1, "Cookie Notice\nunique one\nshare this"),
        (2, "  cookie   notice \nunique two\nshare this"),
        (3, "only mine"),
        (4, "share this"),
    ])
    out = {r["doc_id"]: (r["text"], r["n_dropped_lines"])
           for r in line_dedup(df, min_docs=2).collect()}
    # normalization folds the two cookie-notice spellings together
    assert out[1] == ("unique one", 2)
    assert out[2] == ("unique two", 2)
    assert out[3] == ("only mine", 0)
    assert out[4] == ("", 1)  # all lines boilerplate -> empty doc


def test_line_dedup_within_doc_repeats_do_not_count(spark):
    # the same line 3x in ONE doc is not cross-document boilerplate
    df = _docs(spark, [(1, "same\nsame\nsame"), (2, "other")])
    out = {r["doc_id"]: r["text"] for r in line_dedup(df).collect()}
    assert out[1] == "same\nsame\nsame"


def test_line_dedup_min_docs_threshold(spark):
    df = _docs(spark, [
        (1, "a\nx"), (2, "a\ny"), (3, "a\nz"),
    ])
    # min_docs=4: nothing repeated enough
    kept = {r["doc_id"]: r["text"]
            for r in line_dedup(df, min_docs=4).collect()}
    assert kept == {1: "a\nx", 2: "a\ny", 3: "a\nz"}
    # min_docs=3: 'a' goes
    kept3 = {r["doc_id"]: r["text"]
             for r in line_dedup(df, min_docs=3).collect()}
    assert kept3 == {1: "x", 2: "y", 3: "z"}
    with pytest.raises(ValueError, match="min_docs"):
        line_dedup(df, min_docs=1)


def test_line_dedup_hash_mode_agreement(spark):
    df = _docs(spark, [
        (1, "Breaking News\nstory one\nfollow us"),
        (2, "breaking  news\nstory two\nfollow us"),
        (3, "independent text"),
    ])
    fast = {(r["doc_id"], r["text"])
            for r in line_dedup(df, hash_mode="xxhash64").collect()}
    portable = {(r["doc_id"], r["text"])
                for r in line_dedup(df, hash_mode="md5").collect()}
    assert fast == portable


def test_line_dedup_no_normalize_keeps_variants(spark):
    df = _docs(spark, [(1, "Cookie Notice\na"), (2, "cookie notice\nb")])
    out = {r["doc_id"]: r["text"]
           for r in line_dedup(df, normalize=False).collect()}
    # case differs -> hashes differ -> nothing dropped
    assert out == {1: "Cookie Notice\na", 2: "cookie notice\nb"}


# ----------------------------------------------------------------- Bloom

def test_bloom_no_false_negatives_and_absent_keys_reject(spark):
    from hyped_spark.operators.sketches import bloom_build, bloom_probe

    present = spark.range(2_000).select(
        F.concat(F.lit("in-"), F.col("id")).alias("v"))
    absent = spark.range(2_000).select(
        F.concat(F.lit("out-"), F.col("id")).alias("v"))
    b = bloom_build(present, "v", m_bits=1 << 15, k=5)  # ~16 bits/key
    hits = bloom_probe(b, present, "v", 1 << 15, 5)
    assert hits.filter(~F.col("member")).count() == 0  # never a false neg
    fp = bloom_probe(b, absent, "v", 1 << 15, 5).filter("member").count()
    assert fp < 100  # FPR ~ (1-e^-kn/m)^k ~= 0.2% here; 5% is generous


def test_bloom_merge_equals_whole(spark):
    from hyped_spark.operators.sketches import bloom_build, bloom_merge

    df = spark.range(5_000).select(F.col("id").cast("string").alias("v"))
    whole = bloom_build(df, "v", 1 << 12, 4)
    merged = bloom_merge(
        bloom_build(df.filter("id % 2 = 0"), "v", 1 << 12, 4),
        bloom_build(df.filter("id % 2 = 1"), "v", 1 << 12, 4),
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0


def test_bloom_duckdb_twin_bit_parity(spark):
    from hyped_spark.operators.sketches import (
        bloom_build, bloom_member_sql, bloom_probe,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    built = ev.filter("event_type = 'click'").select("user_id")
    b = bloom_build(built, "user_id", 1 << 10, 4, hash_mode="md5")
    keys = ev.select("user_id").distinct()
    got = {
        (r["user_id"], r["member"])
        for r in bloom_probe(
            b, keys, "user_id", 1 << 10, 4, hash_mode="md5"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = set(con.execute(bloom_member_sql(
        "SELECT DISTINCT user_id AS s FROM events WHERE event_type = 'click'",
        "s", "SELECT DISTINCT user_id FROM events", "user_id", 1 << 10, 4,
    )).fetchall())
    assert got == want and len(got) > 0


def test_bloom_probe_is_pure_map_side(spark):
    """The probe must add NO shuffle: k broadcast joins only."""
    import io
    import re
    from contextlib import redirect_stdout

    from hyped_spark.operators.sketches import bloom_build, bloom_probe

    df = spark.range(100).select(F.col("id").cast("string").alias("v"))
    b = bloom_build(df, "v", 1 << 10, 4)
    buf = io.StringIO()
    with redirect_stdout(buf):
        bloom_probe(b, df, "v", 1 << 10, 4).explain("formatted")
    p = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange hashpartitioning", p)) == 0
    assert "BroadcastHashJoin" in p and "Python" not in p


def test_bloom_rejects_bad_params(spark):
    from hyped_spark.operators.sketches import bloom_build

    df = spark.range(1).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(df, "v", m_bits=32)
    with pytest.raises(ValueError, match="k must"):
        bloom_build(df, "v", k=0)


def test_decontaminate_bloom_superset_of_exact_and_converges(spark):
    """Bloom flags must contain every exact flag (one-sided), and at
    generous sizing the flag sets coincide on this corpus."""
    from hyped_spark.operators.dedup import decontaminate, decontaminate_bloom

    d = spark.read.parquet(f"{SF}/documents.parquet")
    bench = d.filter(F.col("doc_id") % 37 == 0)
    corpus = d.filter(F.col("doc_id") % 37 != 0)
    exact = {
        r["doc_id"]
        for r in decontaminate(corpus, bench, shingle_n=3, mode="flag")
        .filter("contaminated").collect()
    }
    bloomed = {
        r["doc_id"]
        for r in decontaminate_bloom(
            corpus, bench, shingle_n=3, m_bits=1 << 20, k=5, mode="flag"
        ).filter("contaminated").collect()
    }
    assert exact <= bloomed          # never under-flags
    assert bloomed == exact          # 2^20 bits: FPs vanish at this scale
    # drop mode keeps exactly the unflagged docs
    kept = decontaminate_bloom(
        corpus, bench, shingle_n=3, m_bits=1 << 20, k=5, mode="drop"
    ).count()
    assert kept == corpus.count() - len(bloomed)
