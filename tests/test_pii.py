"""PII redaction: native regexp scrub, counts, SQL-twin parity."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

ROWS = [
    (1, "reach me at jane.doe+spam@mail-host.example.org thanks"),
    (2, "server at 192.168.0.17 went down, call 555-0102-4477 now"),
    (3, "no pii here at all; version 1.2 of the doc, room 101"),
    (4, "two mails a@b.co and c.d@e-f.org plus ip 10.0.0.1"),
    (5, None),
]


def test_scrub_and_counts(spark):
    from hyped_spark.functions.text import pii_count_cols, pii_scrub_col

    df = spark.createDataFrame(ROWS, "id long, text string")
    counts = pii_count_cols(F.col("text"))
    out = {
        r.id: r
        for r in df.select(
            "id",
            pii_scrub_col(F.col("text")).alias("clean"),
            *[c.alias(f"n_{k}") for k, c in counts.items()],
        ).collect()
    }
    assert out[1].clean == "reach me at <EMAIL> thanks"
    assert out[1].n_email == 1 and out[1].n_ip == 0 and out[1].n_phone == 0
    assert out[2].clean == "server at <IP> went down, call <PHONE> now"
    assert out[2].n_ip == 1 and out[2].n_phone == 1
    # "1.2" / "101" must NOT be redacted (full IPv4 / phone shapes only)
    assert out[3].clean == ROWS[2][1]
    assert out[4].n_email == 2 and out[4].n_ip == 1
    assert "<EMAIL>" in out[4].clean and "<IP>" in out[4].clean
    assert out[5].clean is None


def test_sql_twin_matches(spark):
    """The DuckDB twin replays the scrub byte-for-byte on every fixture."""
    from hyped_spark.functions.text import (
        PII_PATTERNS,
        pii_count_sql,
        pii_scrub_col,
        pii_scrub_sql,
    )

    df = spark.createDataFrame(ROWS, "id long, text string")
    got = {
        r.id: (r.clean, r.n_email, r.n_ip, r.n_phone)
        for r in df.select(
            "id",
            pii_scrub_col(F.col("text")).alias("clean"),
            *[
                F.regexp_count("text", F.lit(pat)).alias(f"n_{name}")
                for name, pat, _ in PII_PATTERNS
            ],
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
    sql = (
        f"SELECT id, {pii_scrub_sql('text')} AS clean, "
        + ", ".join(
            f"{pii_count_sql('text', name)} AS n_{name}"
            for name, _, _ in PII_PATTERNS
        )
        + " FROM t"
    )
    want = {r[0]: (r[1], r[2], r[3], r[4]) for r in con.sql(sql).fetchall()}
    for i in got:
        # DuckDB len(regexp_extract_all(NULL,..)) is NULL; Spark count on
        # NULL text is NULL too — normalize both to compare
        g = tuple(x if x is not None else None for x in got[i])
        assert g == want[i], (i, got[i], want[i])


def test_normalize_text_col(spark):
    """NFC composition + control strip + whitespace collapse; composed and
    decomposed spellings of the same text converge to one fingerprint."""
    from pyspark.sql import functions as F

    from hyped_spark.functions.text import fingerprint_col, normalize_text_col

    rows = [
        (1, "cafe\u0301 menu"),            # decomposed
        (2, "caf\u00e9 menu"),             # precomposed - same text
        (3, "caf\u00e9\t\u0007menu\u200f "),  # controls + ragged whitespace
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = df.select(
        "id",
        normalize_text_col(F.col("text")).alias("norm"),
        fingerprint_col(normalize_text_col(F.col("text"))).alias("fp"),
    ).collect()
    by_id = {r.id: r for r in out}
    assert by_id[1].norm == by_id[2].norm == by_id[3].norm == "caf\u00e9 menu"
    assert by_id[1].fp == by_id[2].fp == by_id[3].fp
    assert by_id[4].norm is None

    # nfc=False stays fully native (no Python stage in the plan)
    plan = df.select(normalize_text_col(F.col("text"), nfc=False)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_canonical_url_col(spark):
    from pyspark.sql import functions as F

    from hyped_spark.functions.url import canonical_url_col

    cases = [
        (1, "HTTP://Example.COM:80/Path/Page/?utm_source=x&id=5#frag",
         "http://example.com/Path/Page?id=5"),
        (2, "https://site.org:443/", "https://site.org/"),
        (3, "https://site.org/a/b/", "https://site.org/a/b"),
        (4, "http://Host.net/p?utm_a=1&utm_b=2", "http://host.net/p"),
        (5, "http://host.net/p?id=2&utm_a=1", "http://host.net/p?id=2"),
        (6, "  http://host.net/p/?ref=abc  ", "http://host.net/p"),
        (7, "http://host.net/", "http://host.net/"),
        (8, "http://host.net", "http://host.net"),
        (9, "ftp://Weird.Host/A", "ftp://weird.host/A"),
        (10, "https://h.io/x?a=1&fbclid=zz&b=2", "https://h.io/x?a=1&b=2"),
        # param names that merely CONTAIN a tracking name must survive
        # (round-5 advice: the unanchored pattern turned ?pref=1&x=2
        # into ?px=2 — silent corruption of the CDC merge key)
        (11, "http://x.com/?pref=1&x=2", "http://x.com/?pref=1&x=2"),
        (12, "http://x.com/?href=a&x=2", "http://x.com/?href=a&x=2"),
        (13, "http://x.com/?xref=a", "http://x.com/?xref=a"),
        (14, "http://x.com/?pref=1&utm_a=2&x=3", "http://x.com/?pref=1&x=3"),
        # runs of consecutive tracking params collapse in one pass
        (15, "http://x.com/?utm_a=1&utm_b=2&gclid=g&x=3", "http://x.com/?x=3"),
        (16, "http://x.com/?a=1&utm_a=1&utm_b=2", "http://x.com/?a=1"),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in cases],
                               "id long, url string")
    got = {r.id: r.c for r in
           df.select("id", canonical_url_col(F.col("url")).alias("c")).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)

    plan = df.select(canonical_url_col(F.col("url"))) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # fully native

    # DuckDB twin must agree byte-for-byte on every fixture — the oracle
    # can only catch canonicalization bugs if the twins can diverge here.
    import duckdb

    from hyped_spark.functions.url import canonical_url_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, u) for i, u, _ in cases])
    twin = dict(con.execute(
        "SELECT id, " + canonical_url_sql("u") + " FROM t").fetchall())
    for i, _, want in cases:
        assert twin[i] == want, (i, twin[i], want)
