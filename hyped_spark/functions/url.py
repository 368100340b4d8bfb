"""URL canonicalization for web-crawl keys (all native regexp — codegen).

The CDC engine merges on ``url``; crawl feeds routinely deliver the same
page under trivially different spellings (scheme/host case, default ports,
tracking params, fragments, trailing slashes). Canonicalizing BEFORE the
merge key is computed collapses those into one LWW key — the same reason
:func:`hyped_spark.functions.text.normalize_text_col` exists for text.

Every step is a plain regexp/string expression (no UDF, whole-stage
codegen). The patterns deliberately avoid lookarounds so the IDENTICAL
pattern runs under both Java regex (Spark) and RE2 (DuckDB) — see
:func:`canonical_url_sql`, which makes the operator fully oracle-checkable.

Normalization steps (the conservative, loss-free subset of RFC 3986 §6):
1. trim; scheme and host lowercased (path/query case preserved);
2. default ports stripped (``:80`` for http, ``:443`` for https);
3. fragment dropped;
4. tracking params removed (``utm_*``, ``fbclid``, ``gclid``, ``ref``),
   with separators repaired and empty ``?`` dropped;
5. trailing slash trimmed from non-root paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEAD = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
_TRACK = r"(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*"
# Mid-query strip must anchor the param NAME to a separator, else it eats
# substrings of other params (``?pref=1&x=2`` -> ``?px=2``).  The separator is
# captured and restored; the inner ``(...&)+`` consumes RUNS of consecutive
# tracking params in one match, which capture-and-restore alone would miss.
_TRACK_RUN = r"([?&])((utm_[a-z]+|fbclid|gclid|ref)=[^&#]*&)+"


def canonical_url_col(url: Column) -> Column:
    u = F.trim(url)
    # lowercase scheme://host[:port], preserve the rest byte-for-byte
    head = F.lower(F.regexp_extract(u, _HEAD, 1))
    tail = F.regexp_replace(u, _HEAD, "")
    u = F.concat(head, tail)
    u = F.regexp_replace(u, r"^(http://[^/:?#]*):80([/?#]|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]*):443([/?#]|$)", r"$1$2")
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, _TRACK_RUN, r"$1")
    u = F.regexp_replace(u, r"[?&]" + _TRACK + r"$", "")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"\?$", "")
    u = F.regexp_replace(u, r"(://[^/?#]+/[^?#]*[^/?#])/(\?)", r"$1$2")
    u = F.regexp_replace(u, r"(://[^/?#]+/[^?#]*[^/?#])/$", r"$1")
    return u


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url_col` — same patterns in the
    same order (RE2 replacement refs are ``\\1`` where Spark uses ``$1``)."""
    e = f"trim({expr})"
    e = (f"(lower(coalesce(regexp_extract({e}, "
         f"'{_HEAD}', 1), ''))"
         f" || regexp_replace({e}, '{_HEAD}', ''))")
    e = f"regexp_replace({e}, '^(http://[^/:?#]*):80([/?#]|$)', '\\1\\2')"
    e = f"regexp_replace({e}, '^(https://[^/:?#]*):443([/?#]|$)', '\\1\\2')"
    e = f"regexp_replace({e}, '#.*$', '')"
    e = f"regexp_replace({e}, '{_TRACK_RUN}', '\\1', 'g')"
    e = f"regexp_replace({e}, '[?&]{_TRACK}$', '')"
    e = f"regexp_replace({e}, '\\?&', '?')"
    e = f"regexp_replace({e}, '\\?$', '')"
    e = f"regexp_replace({e}, '(://[^/?#]+/[^?#]*[^/?#])/(\\?)', '\\1\\2')"
    e = f"regexp_replace({e}, '(://[^/?#]+/[^?#]*[^/?#])/$', '\\1')"
    return e


def host_col(url: Column) -> Column:
    """Lowercased host of a URL — no scheme, userinfo, port, or path.
    Native regexp only (lookaround-free, Java ≡ RE2)."""
    host = F.regexp_extract(
        F.trim(url), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
    )
    host = F.regexp_replace(host, r"^[^@/]*@", "")
    host = F.regexp_replace(host, r":\d*$", "")
    return F.lower(host)


def host_sql(expr: str) -> str:
    """DuckDB twin of :func:`host_col`."""
    e = (f"coalesce(regexp_extract(trim({expr}), "
         f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '')")
    e = f"regexp_replace({e}, '^[^@/]*@', '')"
    e = f"regexp_replace({e}, ':[0-9]*$', '')"
    return f"lower({e})"


def domain_suffixes_col(host: Column) -> Column:
    """Every dot-suffix of a host, most-specific first:
    ``a.b.example.com`` → ``[a.b.example.com, b.example.com, example.com,
    com]``. A host is blocklisted iff ANY suffix is a listed domain — the
    standard registrable-domain match for UT1-style blocklists. Native
    (split + transform over a sequence); empty host → empty array."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    out = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."),
    )
    return F.when(host == "", F.array().cast("array<string>")).otherwise(out)


def domain_suffixes_sql(expr: str) -> str:
    """DuckDB twin of :func:`domain_suffixes_col`."""
    return (
        f"CASE WHEN {expr} = '' THEN [] ELSE "
        f"[array_to_string(string_split({expr}, '.')[i:], '.') "
        f"for i in generate_series(1, len(string_split({expr}, '.')))] END"
    )


def blocked_url_col(url: Column, domains: list[str]) -> Column:
    """Map-only blocklist probe for a SMALL literal domain list: true iff
    any dot-suffix of the URL's host is in ``domains``. Zero joins, zero
    shuffles — the list is baked into the expression, so use it for
    hand-written deny lists (tens of entries); for UT1-scale lists (millions
    of domains) use
    :func:`hyped_spark.operators.curation.filter_blocklisted_urls`, which
    broadcasts the list as a DataFrame instead of compiling it into the
    plan."""
    lits = F.array(*[F.lit(d.strip().lower()) for d in domains])
    return F.arrays_overlap(domain_suffixes_col(host_col(url)), lits)


def registrable_domain_col(host: Column, n_labels: int = 2) -> Column:
    """Last ``n_labels`` dot-labels of a host — the cheap stand-in for the
    registrable domain (``w3.news.example.com`` → ``example.com``). A real
    deployment would consult the Public Suffix List (``co.uk`` has three
    labels); the PSL is a data file, not an algorithm, so the label count is
    parameterized instead of vendored. Hosts with ≤ ``n_labels`` labels pass
    through unchanged. Native split/slice — codegen, no UDF."""
    parts = F.split(host, r"\.")
    return F.when(F.size(parts) <= n_labels, host).otherwise(
        F.array_join(F.slice(parts, -n_labels, n_labels), ".")
    )


def registrable_domain_sql(expr: str, n_labels: int = 2) -> str:
    """DuckDB twin of :func:`registrable_domain_col`."""
    p = f"string_split({expr}, '.')"
    return (
        f"CASE WHEN len({p}) <= {n_labels} THEN {expr} "
        f"ELSE array_to_string({p}[-{n_labels}:], '.') END"
    )


def extract_links_col(html: Column, base_url: Column | None = None) -> Column:
    """All outlinks of an HTML page: every ``href="..."`` / ``href='...'``
    value, absolute ``http(s)`` links kept as-is, root-relative ``/path``
    links resolved against ``base_url``'s scheme+host when given, all
    others (fragments, javascript:, mailto:, protocol-relative) dropped.
    Native ``regexp_extract_all`` + transform — map-only; feeds
    :func:`hyped_spark.operators.graphs.pagerank` via
    ``host_col``/``registrable_domain_col`` to build the crawl's host
    graph. Lookaround-free patterns (Java regex ≡ RE2)."""
    vals = F.concat(
        F.regexp_extract_all(html, F.lit('href="([^"]*)"'), 1),
        F.regexp_extract_all(html, F.lit("href='([^']*)'"), 1),
    )
    if base_url is not None:
        root = F.regexp_extract(
            F.trim(base_url), r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
        vals = F.transform(
            vals,
            lambda v: F.when(v.rlike(r"^https?://"), v)
            .when(v.rlike(r"^/([^/]|$)") & (root != ""), F.concat(root, v))
            .otherwise(F.lit(None)),
        )
    else:
        vals = F.transform(
            vals, lambda v: F.when(v.rlike(r"^https?://"), v)
        )
    return F.filter(vals, lambda v: v.isNotNull())


def extract_links_sql(html_expr: str, base_expr: str | None = None) -> str:
    """DuckDB twin of :func:`extract_links_col` (duplicates preserved in
    both engines — dedup is the caller's choice, keeping list order
    deterministic for the value comparison)."""
    dq = f"regexp_extract_all({html_expr}, 'href=\"([^\"]*)\"', 1)"
    sq = f"regexp_extract_all({html_expr}, 'href=''([^'']*)''', 1)"
    merged = f"list_concat({dq}, {sq})"
    if base_expr is not None:
        root = (f"coalesce(regexp_extract(trim({base_expr}), "
                f"'^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1), '')")
        resolve = (
            f"CASE WHEN regexp_matches(v, '^https?://') THEN v "
            f"WHEN regexp_matches(v, '^/([^/]|$)') AND {root} != '' "
            f"THEN {root} || v ELSE NULL END"
        )
    else:
        resolve = "CASE WHEN regexp_matches(v, '^https?://') THEN v END"
    return (
        f"list_filter([{resolve} FOR v IN {merged}], x -> x IS NOT NULL)"
    )


_ANCHOR_RE = '<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>'


def extract_anchors_col(html: Column) -> Column:
    """(href, anchor-text) pairs from simple ``<a href="...">text</a>``
    tags — the link-graph signal web search aggregates per target
    (anchor text describes the TARGET page better than its own content;
    the classic document-expansion input). Documented subset: double-
    quoted hrefs, anchor text without nested markup (``[^<]*``) — the
    same honest-subset policy as robots.py. Two ``regexp_extract_all``
    passes over the SAME pattern (groups 1 and 2) are alignment-safe
    because they see identical matches; zip_with pairs them. Map-only,
    lookaround-free (Java regex ≡ RE2)."""
    hrefs = F.regexp_extract_all(html, F.lit(_ANCHOR_RE), 1)
    texts = F.regexp_extract_all(html, F.lit(_ANCHOR_RE), 2)
    pairs = F.zip_with(
        hrefs, texts,
        lambda h, t: F.struct(h.alias("href"), F.trim(t).alias("anchor")),
    )
    return F.filter(
        pairs,
        lambda p: p["href"].rlike("^https?://") & (p["anchor"] != ""),
    )


def extract_anchors_sql(html_expr: str) -> str:
    """DuckDB twin of :func:`extract_anchors_col` — a list of
    (href, anchor) structs."""
    h = f"regexp_extract_all({html_expr}, '{_ANCHOR_RE}', 1)"
    t = f"regexp_extract_all({html_expr}, '{_ANCHOR_RE}', 2)"
    return (
        "list_filter("
        f"[struct_pack(href := ({h})[i], anchor := trim(({t})[i])) "
        f"FOR i IN generate_series(1, len({h}))], "
        "p -> regexp_matches(p.href, '^https?://') AND p.anchor != '')"
    )
