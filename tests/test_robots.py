"""robots.txt parsing and longest-match verdicts (operators/robots.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hyped_spark.operators.robots import (
    parse_robots,
    robots_filter,
    url_path_col,
)

RB = "\n".join([
    "# comment line",
    "User-agent: googlebot",
    "Disallow: /private",
    "",
    "User-agent: bing",
    "User-agent: *",          # shared group: bing AND * -> applies
    "Allow: /pub/open  # trailing comment",
    "Disallow: /pub",
    "Disallow: /tmp",
    "Disallow:",              # empty value = no-op
    "",
    "User-agent: yandex",     # later non-star group: ignored
    "Disallow: /",
])


def _rules(spark):
    robots = spark.createDataFrame(
        [("site.org", RB), ("open.org", "User-agent: *\n# no rules")],
        "host string, robots_txt string",
    )
    return parse_robots(robots)


def test_parse_star_group_only(spark):
    got = sorted(map(tuple, _rules(spark).collect()))
    assert got == [
        ("site.org", False, "/pub"),
        ("site.org", False, "/tmp"),
        ("site.org", True, "/pub/open"),
    ]


def test_verdicts_longest_match(spark):
    pages = spark.createDataFrame(
        [
            (0, "https://site.org/pub/open/x"),   # Allow beats /pub (longer)
            (1, "https://site.org/pub/y"),
            (2, "https://site.org/tmp/z"),
            (3, "https://site.org/private/q"),    # googlebot group ignored
            (4, "https://site.org/"),             # yandex group ignored
            (5, "https://open.org/a"),            # star group, zero rules
            (6, "https://unknown.net/a"),         # no robots at all
        ],
        "id long, url string",
    )
    got = {r.id: r.allowed
           for r in robots_filter(pages, _rules(spark)).collect()}
    assert got == {0: True, 1: False, 2: False, 3: True, 4: True,
                   5: True, 6: True}
    kept = {r.id for r in
            robots_filter(pages, _rules(spark), mode="drop").collect()}
    assert kept == {0, 3, 4, 5, 6}


def test_bad_mode_raises(spark):
    pages = spark.createDataFrame([(0, "https://site.org/")],
                                  "id long, url string")
    with pytest.raises(ValueError, match="mode"):
        robots_filter(pages, _rules(spark), mode="nope")


def test_url_path_normalization(spark):
    df = spark.createDataFrame(
        [("https://h.io",), ("https://h.io/",), ("https://h.io/a/b?q=1",),
         ("https://h.io/x#frag",)],
        "u string",
    )
    got = [r.p for r in df.select(url_path_col(F.col("u")).alias("p")).collect()]
    assert got == ["/", "/", "/a/b?q=1", "/x"]


def test_robots_spec_stage(spark, tmp_path):
    from hyped_spark.plans.spec import _REGISTRY

    rpath = str(tmp_path / "robots")
    spark.createDataFrame(
        [("site.org", "User-agent: *\nDisallow: /no")],
        "host string, robots_txt string",
    ).write.parquet(rpath)
    pages = spark.createDataFrame(
        [(0, "https://site.org/no/x"), (1, "https://site.org/yes")],
        "id long, url string",
    )
    out = _REGISTRY["robots_filter"]({"robots_path": rpath})(pages)
    assert [r.id for r in out.collect()] == [1]


def test_parse_sitemaps(spark):
    from hyped_spark.operators.robots import parse_sitemaps

    rb = ("User-agent: *\nDisallow: /x\n"
          "Sitemap: https://site.org/sitemap.xml  # comment\n"
          "sitemap: https://site.org/news.xml\nSitemap:\n")
    robots = spark.createDataFrame([("site.org", rb)],
                                   "host string, robots_txt string")
    got = sorted(r.sitemap for r in parse_sitemaps(robots).collect())
    assert got == ["https://site.org/news.xml",
                   "https://site.org/sitemap.xml"]


def test_robots_filter_join_shapes(spark):
    """Default carries NO broadcast hint (rules span every host at crawl
    scale — AQE decides at runtime, falling back to a shuffle join on
    host); broadcast_rules=True opts in for provably-small rules frames.
    Round-5 verdict: the unconditional F.broadcast was the one scale flag."""
    import io
    from contextlib import redirect_stdout

    pages = spark.createDataFrame(
        [(0, "https://site.org/pub/x")], "id long, url string")

    def plan(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    # With auto-broadcast disabled, only the explicit hint may broadcast:
    # the default path must degrade to a shuffle join on host — that is
    # the 100 TB shape (rules too big to ship to every executor).
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = plan(robots_filter(pages, _rules(spark),
                                    broadcast_rules=True))
        assert "BroadcastHashJoin" in hinted
        default = plan(robots_filter(pages, _rules(spark)))
        assert "BroadcastHashJoin" not in default.split("Window")[0]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    # results identical either way
    assert sorted(map(tuple, robots_filter(pages, _rules(spark)).collect())) \
        == sorted(map(tuple,
                      robots_filter(pages, _rules(spark),
                                    broadcast_rules=True).collect()))


WILD_RB = "\n".join([
    "User-agent: *",
    "Disallow: /*.pdf$",      # any .pdf path, end-anchored
    "Disallow: /dl/*/raw",    # mid wildcard
    "Allow: /dl/pub*",        # longer pattern wins over /dl/*/raw? no -
                              # /dl/*/raw (9) > /dl/pub* (8): Disallow wins
    "Disallow: /a$b",         # mid $ is LITERAL
])


def _wild_rules(spark):
    robots = spark.createDataFrame(
        [("w.org", WILD_RB)], "host string, robots_txt string")
    return parse_robots(robots)


def test_wildcard_verdicts(spark):
    pages = spark.createDataFrame(
        [
            (0, "https://w.org/docs/file.pdf"),     # *.pdf$ -> blocked
            (1, "https://w.org/docs/file.pdfx"),    # $ anchor -> allowed
            (2, "https://w.org/dl/v1/raw"),         # mid * -> blocked
            (3, "https://w.org/dl/pub/raw"),        # 9-char Disallow beats
                                                    # 8-char Allow
            (4, "https://w.org/dl/pubzzz"),         # Allow prefix, no /raw
            (5, "https://w.org/a$b/x"),             # literal $ -> blocked
            (6, "https://w.org/ab/x"),              # not the literal $ path
        ],
        "id long, url string",
    )
    got = {r.id: r.allowed
           for r in robots_filter(pages, _wild_rules(spark)).collect()}
    assert got == {0: False, 1: True, 2: False, 3: False, 4: True,
                   5: False, 6: True}


def test_wildcard_star_runs_collapse(spark):
    """Adversarial quantifier stacking: a rule with hundreds of
    consecutive '*'s must behave exactly like a single '*' (run-collapse
    is a matching no-op) and must not hang the Java regex engine on a
    long non-matching path."""
    import time

    from hyped_spark.operators.robots import robots_filter

    txt = "User-agent: *\nDisallow: /a" + "*" * 400 + "b$\n"
    rules = spark.createDataFrame(
        [("w.org", txt)], "host string, robots_txt string")
    from hyped_spark.operators.robots import parse_robots

    parsed = parse_robots(rules)
    long_path = "https://w.org/a" + "x" * 5000 + "c"   # no trailing b
    pages = spark.createDataFrame(
        [(0, long_path), (1, "https://w.org/a123b")],
        "id long, url string",
    )
    t0 = time.monotonic()
    got = {r.id: r.allowed for r in robots_filter(pages, parsed).collect()}
    assert time.monotonic() - t0 < 60, "wildcard match did not stay linear"
    assert got == {0: True, 1: False}


def test_wildcard_sql_twin_parity(spark):
    """The DuckDB twin agrees on every wildcard fixture verdict."""
    import duckdb

    from hyped_spark.operators.robots import robots_verdict_sql

    urls = [
        "https://w.org/docs/file.pdf", "https://w.org/docs/file.pdfx",
        "https://w.org/dl/v1/raw", "https://w.org/dl/pub/raw",
        "https://w.org/dl/pubzzz", "https://w.org/a$b/x",
        "https://w.org/ab/x", "https://w.org/",
    ]
    pages = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: r["allowed"]
           for r in robots_filter(pages, _wild_rules(spark)).collect()}

    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute("CREATE TABLE rbt (host VARCHAR, robots_txt VARCHAR)")
    con.execute("INSERT INTO rbt VALUES ('w.org', ?)", [WILD_RB])
    con.execute("CREATE TABLE pages_t (url VARCHAR)")
    con.executemany("INSERT INTO pages_t VALUES (?)", [(u,) for u in urls])
    sql = robots_verdict_sql(
        "SELECT host, robots_txt FROM rbt",
        "SELECT url, 'w.org' AS host, "
        "coalesce(nullif(regexp_extract(url, "
        "'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^#]*)?', 1), ''), '/') "
        "AS path FROM pages_t",
    )
    want = dict(con.execute(sql).fetchall())
    assert got == want


def test_wildcard_translation_fuzz(spark):
    """Property: the rules-side regex translation matches a direct Python
    reference matcher (escape + '*'→'.*' + optional end anchor) for random
    patterns and paths over a hostile alphabet (regex metachars, dots,
    dollars)."""
    import re as _re

    from hypothesis import given, settings, strategies as st

    alpha = "ab/.*$?+()"
    pattern = st.text(alphabet=alpha, min_size=1, max_size=8)
    path = st.text(alphabet=alpha, min_size=0, max_size=10).map(
        lambda s: "/" + s)

    def ref_match(pat: str, p: str) -> bool:
        anchor = pat.endswith("$")
        body = pat[:-1] if anchor else pat
        rx = "".join(".*" if ch == "*" else _re.escape(ch) for ch in body)
        rx = "^" + rx + ("$" if anchor else "")
        return _re.search(rx, p) is not None

    @settings(max_examples=12, deadline=None)
    @given(st.lists(st.tuples(pattern, path), min_size=1, max_size=8))
    def check(cases):
        rules = spark.createDataFrame(
            [("h", False, pat) for pat, _ in cases],
            "host string, allow boolean, prefix string",
        ).dropDuplicates(["prefix"])
        pages = spark.createDataFrame(
            [(f"https://h{p}",) for _, p in cases],
            "url string",
        ).dropDuplicates()
        got = {r["url"]: r["allowed"]
               for r in robots_filter(pages, rules).collect()}
        pats = {pat for pat, _ in cases}
        for _, p in cases:
            # page allowed iff NO disallow pattern matches its path
            want = not any(ref_match(pat, p) for pat in pats)
            assert got[f"https://h{p}"] == want, (p, pats)

    check()
