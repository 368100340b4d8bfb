"""robots.txt directives: parse the ``User-agent: *`` group and apply
longest-match Allow/Disallow verdicts to page URLs.

The politeness half of the crawl stack (outlinks feed the frontier —
functions/url.py: extract_links_col — robots gates what the crawler may
fetch, and at curation time "was this fetch even permitted" is a standard
compliance filter). Implements the documented REP subset every major
parser agrees on:

- groups are maximal runs of consecutive ``User-agent:`` lines followed
  by their rules; a group applies iff one of its agents is ``*``;
- ``Allow:`` / ``Disallow:`` values are path PREFIXES; empty values are
  no-ops; ``#`` comments and blank lines are stripped (blank lines do not
  terminate groups — the modern-parser behavior);
- a URL's verdict comes from the LONGEST matching prefix; on a length
  tie Allow wins; no matching rule ⇒ allowed.

- ``*`` in a rule value matches any character sequence; a trailing ``$``
  anchors the match at the path end (the Google REP wildcard extension);
  a mid-pattern ``$`` is literal. Specificity stays "longest rule value
  wins" (Google's implementation ranks by pattern length). Wildcard-free
  rules keep the plain prefix fast path.

Out of scope (documented): ``Crawl-delay``, per-bot groups other than
``*``.

Scale shape: robots files exist per HOST, not per page — ``parse_robots``
explodes lines and resolves groups with two same-partition windows (ONE
host-keyed exchange over a hosts-sized frame). ``robots_filter`` joins
pages to the broadcast rules table on host, keeps matching prefixes, and
takes the longest per page with a window rank — the page payload crosses
one exchange keyed by url.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_UA = r"^user-agent\s*:"
_RULE = r"^(allow|disallow)\s*:"


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """robots.txt text per host → (host, allow boolean, prefix string),
    the ``User-agent: *`` group's prefix rules."""
    lines = F.split(F.col(robots_col), "\n")
    e = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(lines).alias("ord", "__raw"),
    ).withColumn(
        "__ln", F.trim(F.regexp_replace(F.col("__raw"), r"#.*$", ""))
    ).filter(F.col("__ln") != "")
    low = F.lower(F.col("__ln"))
    val = F.trim(F.regexp_replace(F.col("__ln"), r"^[^:]*:", ""))
    e = e.select(
        "host", "ord",
        low.rlike(_UA).alias("__ua"),
        low.rlike(_RULE).alias("__rule"),
        low.rlike(r"^allow\s*:").alias("allow"),
        val.alias("__val"),
    )
    w = Window.partitionBy("host").orderBy("ord")
    # a group starts at a UA line not preceded by another UA line; rules
    # inherit the running group counter
    e = e.withColumn(
        "__start",
        (F.col("__ua")
         & ~F.coalesce(F.lag("__ua").over(w), F.lit(False))).cast("int"),
    ).withColumn("__grp", F.sum("__start").over(w))
    # the group is live iff any of its UA lines names '*'
    wg = Window.partitionBy("host", "__grp")
    e = e.withColumn(
        "__star",
        F.max((F.col("__ua") & (F.col("__val") == "*")).cast("int")).over(wg),
    )
    return (
        e.filter(
            F.col("__rule") & (F.col("__grp") > 0) & (F.col("__star") == 1)
            & (F.col("__val") != "")
        )
        .select("host", "allow", F.col("__val").alias("prefix"))
    )


def url_path_col(url: Column) -> Column:
    """Path component of a URL; empty/absent paths normalize to ``/``."""
    p = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^#]*)?", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    mode: str = "flag",
    flag_col: str = "allowed",
    broadcast_rules: bool = False,
) -> DataFrame:
    """Apply parsed robots rules to pages: longest matching prefix decides,
    Allow wins length ties, no match ⇒ allowed. ``mode="drop"`` keeps only
    allowed pages; ``mode="flag"`` adds a boolean.

    Join shape: the rules side of a full crawl snapshot spans EVERY host —
    tens of millions of (host, prefix, allow) rows at 100 TB, past any sane
    broadcast ceiling — so by default the join carries NO broadcast hint:
    AQE broadcasts a provably-small rules frame at runtime and falls back
    to a shuffle join on ``host`` (exactly the key the verdict window
    already partitions by, so the exchange is reused) otherwise. Pass
    ``broadcast_rules=True`` only when the caller KNOWS the rules frame is
    small (a single-site allowlist, a test fixture) — same opt-in contract
    as ``filter_blocklisted_urls(broadcast_hits=...)``.
    """
    from hyped_spark.functions.url import host_col

    p = pages.select(
        F.col(url_col).alias("__u"),
        host_col(F.col(url_col)).alias("host"),
        url_path_col(F.col(url_col)).alias("__path"),
    )
    # wildcard rules compile to anchored regexes ON THE RULES SIDE (one
    # row per rule, not per candidate pair); plain prefixes keep the
    # startswith fast path. Trailing $ anchors; mid-pattern $ is literal.
    anchor = F.col("prefix").rlike(r"\$$")
    body = F.when(
        anchor, F.expr("substring(prefix, 1, length(prefix) - 1)")
    ).otherwise(F.col("prefix"))
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    # robots.txt is UNTRUSTED web content: collapse runs of '*' before
    # compiling ('**' matches exactly what '*' matches, so verdicts are
    # unchanged — the DuckDB twin needs no mirror) so an adversarial
    # '****...' rule cannot stack quantifiers. Residual: a rule with many
    # DISTINCT '*'-separated segments still costs O(path_len^k) in Java's
    # backtracking engine; a hard cap on k (Google caps ~10) would change
    # verdicts for such rules and is left for a build round where the
    # oracle twin can mirror it.
    rx = F.concat(
        F.lit("^"),
        F.regexp_replace(F.regexp_replace(esc, r"\*+", "*"), r"\*", ".*"),
        F.when(anchor, F.lit("$")).otherwise(F.lit("")),
    )
    rules = rules.withColumn(
        "__wild", F.col("prefix").contains("*") | anchor
    ).withColumn("__re", rx)
    r = F.broadcast(rules) if broadcast_rules else rules
    cand = p.join(r, "host", "left").filter(
        F.col("prefix").isNull()
        | F.when(F.col("__wild"),
                 F.regexp_like(F.col("__path"), F.col("__re")))
        .otherwise(F.col("__path").startswith(F.col("prefix")))
    )
    w = Window.partitionBy("__u").orderBy(
        F.length(F.coalesce(F.col("prefix"), F.lit(""))).desc(),
        F.col("allow").desc(),
    )
    verdict = (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "__u",
            F.coalesce(F.col("allow"), F.lit(True)).alias(flag_col),
        )
    )
    out = pages.join(verdict, pages[url_col] == verdict["__u"], "left") \
        .drop("__u")
    out = out.withColumn(flag_col, F.coalesce(F.col(flag_col), F.lit(True)))
    if mode == "flag":
        return out
    if mode == "drop":
        return out.filter(F.col(flag_col)).drop(flag_col)
    raise ValueError(f"unknown robots mode: {mode!r}")


def robots_verdict_sql(
    robots_cte: str,
    pages_cte: str,
    flag_col: str = "allowed",
) -> str:
    """DuckDB twin: ``robots_cte`` selects (host, robots_txt), ``pages_cte``
    selects (url, host, path); returns SQL yielding (url, allowed) with the
    identical group/longest-match semantics."""
    return f"""
        WITH rb AS ({robots_cte}),
        pg AS ({pages_cte}),
        ln0 AS (
            SELECT host,
                   unnest(generate_series(1,
                       len(string_split(robots_txt, chr(10))))) AS ord,
                   unnest(string_split(robots_txt, chr(10))) AS raw
            FROM rb
        ),
        ln AS (
            SELECT host, ord,
                   trim(regexp_replace(raw, '#.*$', '')) AS l
            FROM ln0 WHERE trim(regexp_replace(raw, '#.*$', '')) != ''
        ),
        mk AS (
            SELECT host, ord,
                   regexp_matches(lower(l), '^user-agent\\s*:') AS ua,
                   regexp_matches(lower(l), '^(allow|disallow)\\s*:') AS rule,
                   regexp_matches(lower(l), '^allow\\s*:') AS al,
                   trim(regexp_replace(l, '^[^:]*:', '')) AS v
            FROM ln
        ),
        st AS (
            SELECT *, CASE WHEN ua AND NOT coalesce(
                       lag(ua) OVER (PARTITION BY host ORDER BY ord), false)
                   THEN 1 ELSE 0 END AS strt
            FROM mk
        ),
        grp AS (
            SELECT *, sum(strt)
                   OVER (PARTITION BY host ORDER BY ord) AS g
            FROM st
        ),
        star AS (
            SELECT *, max(CASE WHEN ua AND v = '*' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY host, g) AS s
            FROM grp
        ),
        rules0 AS (
            SELECT host, al AS allow, v AS prefix
            FROM star WHERE rule AND g > 0 AND s = 1 AND v != ''
        ),
        rules AS (
            SELECT host, allow, prefix,
                   (contains(prefix, '*') OR prefix LIKE '%$') AS wild,
                   '^' || replace(regexp_replace(
                       CASE WHEN prefix LIKE '%$'
                            THEN substr(prefix, 1, length(prefix) - 1)
                            ELSE prefix END,
                       '([.^$+?(){{}}\\[\\]|\\\\])', '\\\\\\1', 'g'),
                       '*', '.*')
                   || CASE WHEN prefix LIKE '%$' THEN '$' ELSE '' END AS re
            FROM rules0
        ),
        cand AS (
            SELECT pg.url, rules.allow, rules.prefix
            FROM pg LEFT JOIN rules
              ON pg.host = rules.host AND
                 CASE WHEN rules.wild
                      THEN regexp_matches(pg.path, rules.re)
                      ELSE starts_with(pg.path, rules.prefix) END
        ),
        verdict AS (
            SELECT url, coalesce(allow, true) AS {flag_col}
            FROM (
                SELECT *, row_number() OVER (PARTITION BY url
                    ORDER BY length(coalesce(prefix, '')) DESC,
                             allow DESC) AS rn
                FROM cand
            ) WHERE rn = 1
        )
        SELECT url, {flag_col} FROM verdict
    """


def parse_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """``Sitemap:`` declarations per host → (host, sitemap). Sitemap lines
    are group-independent in REP (they apply regardless of User-agent
    position), so this is a plain per-line extraction — native regexp over
    the exploded lines, map-only."""
    lines = F.split(F.col(robots_col), "\n")
    e = robots.select(
        F.col(host_col).alias("host"),
        F.explode(lines).alias("__raw"),
    ).withColumn(
        "__ln", F.trim(F.regexp_replace(F.col("__raw"), r"#.*$", ""))
    )
    return (
        e.filter(F.lower(F.col("__ln")).rlike(r"^sitemap\s*:"))
        .select(
            "host",
            F.trim(F.regexp_replace(F.col("__ln"), r"^[^:]*:", ""))
            .alias("sitemap"),
        )
        .filter(F.col("sitemap") != "")
    )
