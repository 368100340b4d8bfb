"""Deterministic synthetic Common-Crawl-style pages and CDC binlog.

Everything is a pure function of (seed, row id): generation runs as
``spark.range(n)`` + native expressions + one Arrow-vectorized pandas UDF for
the HTML payload — embarrassingly parallel, no driver-side loops, identical
output at any partitioning/parallelism (needed for replay-equivalence and the
two-parallelism scaling benchmark).

Binlog shape (FIXTURES.md §2):
  lsn:long (strictly increasing) | op:string insert/update/delete |
  url:string (merge key, skewed) | warc_ts:timestamp | html:binary |
  lang:string | fetch_status (column-add then int→long widen mid-log).

The schema-evolution events are materialized as *segments* with genuinely
different file schemas (segment 0: no fetch_status; 1: int; 2: long), which is
what a real WAL tail delivers.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEED = 42
BASE_TS = "2024-01-01 00:00:00"  # fixed epoch base for warc_ts determinism

_WORDS = {
    "en": "the quick brown fox jumps over lazy dog web page crawl data content".split(),
    "de": "der schnelle braune fuchs springt über den faulen hund seite inhalt".split(),
    "fr": "le renard brun rapide saute par dessus le chien paresseux page contenu".split(),
    "es": "el zorro marrón rápido salta sobre el perro perezoso página contenido".split(),
    "it": "la volpe marrone veloce salta sopra il cane pigro pagina contenuto".split(),
}
_LANGS = sorted(_WORDS)


def _h(*parts: object) -> int:
    """Stable 64-bit hash of the stringified parts (seeded)."""
    m = hashlib.sha256(("|".join(map(str, parts)) + f"|{SEED}").encode())
    return int.from_bytes(m.digest()[:8], "big")


def url_for(i: int, n_hosts: int = 50) -> str:
    return f"https://host{_h('host', i) % n_hosts}.example/p/{i}"


def lang_for(url: str) -> str:
    return _LANGS[_h("lang", url) % len(_LANGS)]


def gen_html(url: str, version: int) -> bytes:
    """Deterministic pseudo-HTML for (url, version). Pure function."""
    lang = lang_for(url)
    words = _WORDS[lang]
    seed = _h("html", url, version)
    title = " ".join(words[(seed >> (4 * k)) % len(words)] for k in range(3))
    paras = []
    n_paras = 2 + seed % 4
    for p in range(n_paras):
        ps = _h("para", url, version, p)
        body = " ".join(words[(ps >> (3 * k)) % len(words)] for k in range(20 + ps % 30))
        paras.append(f"<p>{body} v{version}</p>")
    doc = (
        f"<html><head><title>{title}</title>"
        f"<script>var x={seed % 997};</script>"
        f"<style>body{{margin:0}}</style></head>"
        f"<body><h1>{title}</h1><!-- comment {version} -->"
        + "".join(paras)
        + f"<div>lang={lang} url={url}</div></body></html>"
    )
    return doc.encode("utf-8")


# -- single-pass event synthesis (one mapInPandas stage, not chained UDFs) --

_BASE_EPOCH_US = pd.Timestamp(BASE_TS).value // 1000


def _op_for(h: int) -> str:
    m = h % 10
    return "insert" if m < 2 else ("update" if m < 9 else "delete")


def events_pdf(lsns, n_urls: int, hot_urls: int, hot_pct: int) -> pd.DataFrame:
    """Events for an array of lsns — pure function of lsn (order-free)."""
    rows = {"lsn": [], "op": [], "url": [], "warc_ts": [], "html": [], "lang": []}
    for lsn in lsns:
        lsn = int(lsn)
        h = _h("evt", lsn) & 0x7FFFFFFFFFFFFFFF
        if h % 100 < hot_pct:
            uidx = (h >> 8) % hot_urls
        else:
            uidx = (h >> 16) % n_urls
        url = url_for(uidx)
        op = _op_for(h)
        rows["lsn"].append(lsn)
        rows["op"].append(op)
        rows["url"].append(url)
        rows["warc_ts"].append(_BASE_EPOCH_US + lsn * 1_000_000)
        rows["html"].append(None if op == "delete" else gen_html(url, lsn))
        rows["lang"].append(lang_for(url))
    out = pd.DataFrame(rows)
    out["warc_ts"] = pd.to_datetime(out["warc_ts"], unit="us")
    out["_h"] = [(_h("evt", int(x)) & 0x7FFFFFFFFFFFFFFF) for x in out["lsn"]]
    return out


# ---------------------------------------------------------------------------
# Pages table (the initial target-table state, if a non-empty start is wanted)
# ---------------------------------------------------------------------------


def pages_table(spark: SparkSession, n_urls: int, partitions: int | None = None) -> DataFrame:
    """Deterministic pages table: url, warc_ts, html, text, lang — one
    mapInPandas pass (generation + extraction in a single Arrow stage)."""
    from hyped_spark.functions.text import extract_text_bytes

    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])

    def gen(batches):  # pragma: no cover (executor)
        for pdf in batches:
            urls = [url_for(int(i)) for i in pdf["id"]]
            htmls = [gen_html(u, 0) for u in urls]
            out = pd.DataFrame({
                "url": urls,
                "warc_ts": pd.to_datetime(
                    [_BASE_EPOCH_US + int(i) * 1_000_000 for i in pdf["id"]], unit="us"
                ),
                "html": htmls,
                "text": [extract_text_bytes(h) for h in htmls],
                "lang": [lang_for(u) for u in urls],
            })
            yield out

    df = spark.range(0, n_urls, numPartitions=partitions)
    return df.mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# Binlog
# ---------------------------------------------------------------------------

# Evolution breakpoints as fractions of the log: before ADD_FRAC no
# fetch_status exists; between ADD and WIDEN it's int32; after WIDEN int64
# (with values exceeding int32 range to make the widen observable).
ADD_FRAC = 0.4
WIDEN_FRAC = 0.7


def _event_frame(
    spark: SparkSession,
    lsn_start: int,
    lsn_end: int,
    n_urls: int,
    hot_urls: int,
    hot_pct: int,
    partitions: int | None,
) -> DataFrame:
    """Events with lsn in [lsn_start, lsn_end); pure function of lsn.

    One mapInPandas stage generates every column (hash routing with
    hot_pct% skew toward `hot_urls` keys, op mix 20/70/10
    insert/update/delete, deterministic HTML payload)."""
    schema = T.StructType([
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("lang", T.StringType()),
        T.StructField("_h", T.LongType()),
    ])

    def gen(batches):  # pragma: no cover (executor)
        for pdf in batches:
            yield events_pdf(pdf["id"].to_numpy(), n_urls, hot_urls, hot_pct)

    base = spark.range(lsn_start, lsn_end, numPartitions=partitions)
    return base.mapInPandas(gen, schema)


def binlog_segments(
    spark: SparkSession,
    n_events: int,
    n_urls: int,
    hot_urls: int = 4,
    hot_pct: int = 3,
    partitions: int | None = None,
) -> list[DataFrame]:
    """The log as 3 schema-evolution segments (see module docstring)."""
    add_at = int(n_events * ADD_FRAC)
    widen_at = int(n_events * WIDEN_FRAC)
    seg0 = _event_frame(spark, 0, add_at, n_urls, hot_urls, hot_pct, partitions).select(
        "lsn", "op", "url", "warc_ts", "html", "lang"
    )
    seg1 = _event_frame(spark, add_at, widen_at, n_urls, hot_urls, hot_pct, partitions)
    seg1 = seg1.withColumn(
        "fetch_status",
        F.when(F.col("op") == "delete", F.lit(None).cast("int")).otherwise(
            (F.lit(200) + F.pmod(F.col("_h"), F.lit(5)).cast("int"))
        ),
    ).select("lsn", "op", "url", "warc_ts", "html", "lang", "fetch_status")
    seg2 = _event_frame(spark, widen_at, n_events, n_urls, hot_urls, hot_pct, partitions)
    seg2 = seg2.withColumn(
        "fetch_status",
        F.when(F.col("op") == "delete", F.lit(None).cast("long")).otherwise(
            # values beyond int32 range prove the widen happened
            F.lit(2_200_000_000) + F.pmod(F.col("_h"), F.lit(5))
        ),
    ).select("lsn", "op", "url", "warc_ts", "html", "lang", "fetch_status")
    return [seg0, seg1, seg2]


def binlog(
    spark: SparkSession,
    n_events: int,
    n_urls: int,
    hot_urls: int = 4,
    hot_pct: int = 3,
    partitions: int | None = None,
) -> DataFrame:
    """Whole log as one DataFrame with the final (widened) schema."""
    segs = binlog_segments(spark, n_events, n_urls, hot_urls, hot_pct, partitions)
    segs = [s.withColumn("fetch_status", F.col("fetch_status").cast("long"))
            if "fetch_status" in s.columns
            else s.withColumn("fetch_status", F.lit(None).cast("long"))
            for s in segs]
    out = segs[0]
    for s in segs[1:]:
        out = out.unionByName(s)
    return out


def write_binlog_segments(
    spark: SparkSession,
    out_dir: str,
    n_events: int,
    n_urls: int,
    hot_urls: int = 4,
    hot_pct: int = 3,
    partitions: int | None = None,
) -> list[str]:
    """Materialize segments as parquet dirs seg00000/ seg00001/ ... (the
    file-based ordered change source consumed by the streaming front-end)."""
    paths = []
    for i, seg in enumerate(
        binlog_segments(spark, n_events, n_urls, hot_urls, hot_pct, partitions)
    ):
        p = os.path.join(out_dir, f"seg{i:05d}")
        seg.write.mode("overwrite").parquet(p)
        paths.append(p)
    return paths
