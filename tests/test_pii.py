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
