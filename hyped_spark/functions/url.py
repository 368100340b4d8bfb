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


def canonical_url_col(url: Column) -> Column:
    u = F.trim(url)
    # lowercase scheme://host[:port], preserve the rest byte-for-byte
    head = F.lower(F.regexp_extract(u, _HEAD, 1))
    tail = F.regexp_replace(u, _HEAD, "")
    u = F.concat(head, tail)
    u = F.regexp_replace(u, r"^(http://[^/:?#]*):80([/?#]|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]*):443([/?#]|$)", r"$1$2")
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, _TRACK + r"&", "")
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
    e = f"regexp_replace({e}, '{_TRACK}&', '', 'g')"
    e = f"regexp_replace({e}, '[?&]{_TRACK}$', '')"
    e = f"regexp_replace({e}, '\\?&', '?')"
    e = f"regexp_replace({e}, '\\?$', '')"
    e = f"regexp_replace({e}, '(://[^/?#]+/[^?#]*[^/?#])/(\\?)', '\\1\\2')"
    e = f"regexp_replace({e}, '(://[^/?#]+/[^?#]*[^/?#])/$', '\\1')"
    return e
