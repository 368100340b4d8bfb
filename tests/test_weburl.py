"""Domain blocklist filtering and per-domain quota caps.

The webtext-curation pair every crawl pipeline runs between "fetched" and
"training mix": drop documents from deny-listed domains (UT1-style suffix
match) and cap any single domain's share of the corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hyped_spark.functions.url import (
    blocked_url_col,
    domain_suffixes_col,
    host_col,
    registrable_domain_col,
)
from hyped_spark.operators.curation import cap_per_domain, filter_blocklisted_urls

URLS = [
    (0, "https://User:pw@A.B.Example.COM:8080/p?q=1"),
    (1, "http://example.com/x"),
    (2, "https://w1.ads.example.com/z"),
    (3, "http://news.site.org/a"),
    (4, "https://blog.site.org/b"),
    (5, "https://site.org/c"),
    (6, "not a url"),
    (7, "ftp://host/x"),
]


def test_host_and_suffixes(spark):
    df = spark.createDataFrame(URLS, "id long, url string")
    rows = df.select(
        "id",
        host_col(F.col("url")).alias("h"),
        domain_suffixes_col(host_col(F.col("url"))).alias("s"),
    ).collect()
    got = {r.id: (r.h, r.s) for r in rows}
    # userinfo, port and case all stripped; path untouched
    assert got[0] == (
        "a.b.example.com",
        ["a.b.example.com", "b.example.com", "example.com", "com"],
    )
    # non-URL text has no scheme -> empty host, empty suffix set
    assert got[6] == ("", [])
    # any scheme accepted, single-label host is its own only suffix
    assert got[7] == ("host", ["host"])


def test_registrable_domain_label_heuristic(spark):
    df = spark.createDataFrame(
        [("w3.news.example.com",), ("example.com",), ("com",), ("",)],
        "h string",
    )
    got = [r.d for r in df.select(
        registrable_domain_col(F.col("h")).alias("d")).collect()]
    assert got == ["example.com", "example.com", "com", ""]
    got3 = [r.d for r in df.select(
        registrable_domain_col(F.col("h"), n_labels=3).alias("d")).collect()]
    assert got3 == ["news.example.com", "example.com", "com", ""]


def test_blocklist_drop_and_flag_match_suffix_semantics(spark):
    df = spark.createDataFrame(URLS, "id long, url string")
    bl = spark.createDataFrame(
        [(" Example.COM ",), ("site.org",)], "domain string"
    )  # list entries normalize (trim + lowercase) before matching
    kept = {r.id for r in filter_blocklisted_urls(df, bl).collect()}
    assert kept == {6, 7}
    flags = {
        r.id: r.blocked
        for r in filter_blocklisted_urls(df, bl, mode="flag").collect()
    }
    assert flags == {i: i not in (6, 7) for i in range(8)}
    # literal-list map-only probe agrees
    lit = {
        r.id: r.b
        for r in df.select(
            "id",
            blocked_url_col(F.col("url"), ["example.com", "site.org"]).alias("b"),
        ).collect()
    }
    assert lit == flags


def test_blocklist_unknown_mode_raises(spark):
    df = spark.createDataFrame(URLS, "id long, url string")
    bl = spark.createDataFrame([("x.org",)], "domain string")
    with pytest.raises(ValueError, match="mode"):
        filter_blocklisted_urls(df, bl, mode="bogus")


def _capped_corpus(spark, n=60):
    rows = [(i, f"https://w{i % 3}.dom{i % 4}.net/p/{i}", float(i % 7))
            for i in range(n)]
    return spark.createDataFrame(rows, "id long, url string, score double")


def test_cap_per_domain_bounds_and_determinism(spark):
    df = _capped_corpus(spark)
    out = cap_per_domain(df, k=3, domain_out="domain")
    per_dom = (
        out.groupBy("domain").count().collect()
    )
    assert {r.domain for r in per_dom} == {f"dom{i}.net" for i in range(4)}
    assert all(r["count"] == 3 for r in per_dom)
    # deterministic under repartitioning (hash-ranked, not arrival-order)
    again = cap_per_domain(df.repartition(13), k=3, domain_out="domain")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # k larger than any domain keeps everything
    assert cap_per_domain(df, k=1000).count() == 60


def test_cap_per_domain_order_col_ascending_keeps_lowest(spark):
    df = _capped_corpus(spark)
    out = cap_per_domain(df, k=2, order_col="score", domain_out="domain")
    kept = {}
    for r in out.collect():
        kept.setdefault(r.domain, []).append(r.score)
    # default ranks ascending: the cap keeps each domain's 2 LOWEST scores
    full = {}
    for r in df.withColumn(
        "d", registrable_domain_col(host_col(F.col("url")))
    ).collect():
        full.setdefault(r.d, []).append(r.score)
    for dom, scores in kept.items():
        assert sorted(scores) == sorted(full[dom])[:2]


def test_cap_per_domain_descending_keeps_best(spark):
    # higher-is-better scores (quality) need descending=True, else each
    # domain keeps its WORST documents (round-5 advice)
    df = _capped_corpus(spark)
    out = cap_per_domain(df, k=2, order_col="score", domain_out="domain",
                         descending=True)
    kept = {}
    for r in out.collect():
        kept.setdefault(r.domain, []).append(r.score)
    full = {}
    for r in df.withColumn(
        "d", registrable_domain_col(host_col(F.col("url")))
    ).collect():
        full.setdefault(r.d, []).append(r.score)
    for dom, scores in kept.items():
        assert sorted(scores, reverse=True) == \
            sorted(full[dom], reverse=True)[:2]


def test_spec_stages_run(spark, tmp_path):
    from hyped_spark.plans.spec import _REGISTRY

    df = _capped_corpus(spark)
    bl_path = str(tmp_path / "bl")
    spark.createDataFrame([("dom2.net",)], "domain string").write.parquet(bl_path)
    dropped = _REGISTRY["blocklist_filter"]({"blocklist_path": bl_path})(df)
    assert dropped.count() == 45
    capped = _REGISTRY["cap_per_domain"]({"k": 2, "domain_out": "domain"})(df)
    assert capped.count() == 8


def test_blocked_url_col_on_a_stream(spark, tmp_path):
    """The literal-list probe is a pure column expression, so the blocklist
    gate drops rows inside a streaming query with no state and no extra
    plan surgery (the DataFrame-blocklist variant needs its hit-set
    aggregation and is the batch path)."""
    src = tmp_path / "urls"
    src.mkdir()
    spark.createDataFrame(URLS, "id long, url string").coalesce(1) \
        .write.parquet(str(src / "seg0"))
    stream = (
        spark.readStream.schema("id long, url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .filter(~blocked_url_col(F.col("url"), ["example.com", "site.org"]))
    )
    q = (
        stream.writeStream.format("memory").queryName("bl_kept")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    kept = {r.id for r in spark.sql("SELECT id FROM bl_kept").collect()}
    assert kept == {6, 7}


def test_blocklist_no_broadcast_same_result(spark):
    df = spark.createDataFrame(URLS, "id long, url string")
    bl = spark.createDataFrame([("example.com",), ("site.org",)], "domain string")
    a = sorted(r.id for r in filter_blocklisted_urls(df, bl).collect())
    b = sorted(r.id for r in
               filter_blocklisted_urls(df, bl, broadcast_hits=False).collect())
    assert a == b == [6, 7]


def test_extract_links_resolution_rules(spark):
    from hyped_spark.functions.url import extract_links_col

    rows = [(0,
             '<a href="https://a.example/x">x</a> <a href="/rel">r</a> '
             "<a href='http://b.example/y'>y</a> <a href=\"#frag\">f</a> "
             '<a href="mailto:z@q">m</a> <a href="//proto.rel/p">pr</a>',
             "https://Base.example:8080/page")]
    df = spark.createDataFrame(rows, "id long, html string, url string")
    got = df.select(
        extract_links_col(F.col("html"), F.col("url")).alias("l")
    ).collect()[0].l
    # absolute kept, root-relative resolved against scheme+host (case and
    # port preserved from the base), fragment/mailto/protocol-relative drop
    assert got == ["https://a.example/x", "https://Base.example:8080/rel",
                   "http://b.example/y"]
    # without a base, only absolute links survive
    bare = df.select(extract_links_col(F.col("html")).alias("l")) \
        .collect()[0].l
    assert bare == ["https://a.example/x", "http://b.example/y"]


def test_suffix_match_randomized_vs_python_reference(spark):
    """Randomized batch check: for 300 seeded random hosts/URLs and a
    random blocklist, the engine's suffix-match verdicts equal a plain
    Python reference computed from first principles."""
    import random

    rng = random.Random(20260817)
    labels = ["a", "bb", "ccc", "example", "site", "com", "org", "net"]

    def rand_host():
        return ".".join(rng.choice(labels)
                        for _ in range(rng.randint(1, 4)))

    urls = [(i, f"https://{rand_host()}/p/{i}") for i in range(300)]
    domains = sorted({rand_host() for _ in range(12)})

    def py_blocked(url):
        host = url.split("://")[1].split("/")[0].lower()
        parts = host.split(".")
        sufx = {".".join(parts[i:]) for i in range(len(parts))}
        return bool(sufx & set(domains))

    df = spark.createDataFrame(urls, "id long, url string")
    bl = spark.createDataFrame([(d,) for d in domains], "domain string")
    flags = {
        r.id: r.blocked
        for r in filter_blocklisted_urls(df, bl, mode="flag").collect()
    }
    expected = {i: py_blocked(u) for i, u in urls}
    assert flags == expected
    lit = {
        r.id: r.b
        for r in df.select(
            "id", blocked_url_col(F.col("url"), domains).alias("b")
        ).collect()
    }
    assert lit == expected


def test_extract_anchors_fixtures(spark):
    """(href, anchor) extraction: absolute links kept with trimmed text,
    relative/fragment/empty-anchor dropped; SQL twin bit-matches."""
    import duckdb

    from hyped_spark.functions.url import extract_anchors_col, extract_anchors_sql

    rows = [
        (1, '<a href="https://a.com/x">Click Here</a>'
            '<a href="/rel">rel</a><a href="#f">frag</a>'
            '<a href="http://b.net/y">  padded  </a>'
            '<a href="https://c.org/z"></a>'),
        (2, "no links at all"),
        (3, '<a class="big" href="https://d.io/p" id="l"> Styled </a>'),
    ]
    df = spark.createDataFrame(rows, "id long, html string")
    got = {r["id"]: [(p["href"], p["anchor"]) for p in r["a"]]
           for r in df.select(
               "id", extract_anchors_col(F.col("html")).alias("a")
           ).collect()}
    assert got[1] == [("https://a.com/x", "Click Here"),
                      ("http://b.net/y", "padded")]
    assert got[2] == []
    assert got[3] == [("https://d.io/p", "Styled")]

    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute("CREATE TABLE t (id BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        i: [(p["href"], p["anchor"]) for p in a]
        for i, a in con.execute(
            f"SELECT id, {extract_anchors_sql('html')} FROM t"
        ).fetchall()
    }
    assert got == want
