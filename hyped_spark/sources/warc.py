"""WARC (Web ARChive, ISO 28500) reader — the Common Crawl native format.

A crawl pipeline's raw input is WARC: concatenated records, each a
``WARC/1.0`` header block (CRLF lines, terminated by a blank line)
followed by exactly ``Content-Length`` payload bytes and a ``CRLF CRLF``
record separator. Common Crawl ships them as *member-per-record* gzip
(``.warc.gz``), which whole-file gunzips to the same concatenation.

Spark-first shape: a ``binaryFile`` scan fans file blobs out to executors
and :func:`parse_warc_bytes` (pure stdlib) runs inside ``mapInPandas`` —
the file is the parallelism unit, exactly how WARC is meant to be
processed at scale (Common Crawl publishes ~64k files per snapshot, ~1 GB
each; records inside a gzip member chain can't be split anyway). Payloads
stay ``binary`` columns end-to-end (the multimodal column convention —
see functions/multimodal.py); downstream decode is the consumer's choice.

Parity note: the reference's dataset loaders (reference
src/hyped/data/io/datasets/typed_json.py, cas.py) cover JSON/CAS corpora;
WARC is the web-crawl analogue this engine's CDC tier ingests from.
"""

from __future__ import annotations

import gzip
import io

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_CRLF = b"\r\n"

WARC_SCHEMA = T.StructType([
    T.StructField("file", T.StringType()),
    T.StructField("record_idx", T.LongType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("content_length", T.LongType()),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
    T.StructField("payload", T.BinaryType()),
])


def encode_warc_record(
    url: str,
    payload: bytes,
    warc_type: str = "response",
    warc_date: str = "2024-01-01T00:00:00Z",
    record_id: str | None = None,
    content_type: str = "text/plain",
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """Serialize one record (pure function; used by writers and tests)."""
    heads = [
        ("WARC-Type", warc_type),
        ("WARC-Target-URI", url),
        ("WARC-Date", warc_date),
        ("WARC-Record-ID", record_id or f"<urn:uuid:{abs(hash(url))}>"),
        ("Content-Type", content_type),
        ("Content-Length", str(len(payload))),
    ]
    for k, v in (extra_headers or {}).items():
        heads.append((k, v))
    out = b"WARC/1.0" + _CRLF
    out += b"".join(f"{k}: {v}".encode() + _CRLF for k, v in heads)
    out += _CRLF + payload + _CRLF + _CRLF
    return out


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse a concatenation of WARC records (transparently gunzipping
    ``.warc.gz`` content, including Common Crawl's member-per-record gzip
    chains). Returns one dict per record; tolerant of trailing junk after
    the last record (stops at the first malformed header block)."""
    if data[:2] == b"\x1f\x8b":
        # GzipFile consumes ALL members of a chained stream
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as g:
            data = g.read()
    out: list[dict] = []
    pos = 0
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = data.find(_CRLF + _CRLF, start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        lines = data[start:head_end].split(_CRLF)
        for line in lines[1:]:
            k, sep, v = line.decode("utf-8", "replace").partition(":")
            if sep:
                headers[k.strip()] = v.strip()
        try:
            clen = int(headers.get("Content-Length", ""))
        except ValueError:
            break
        body_start = head_end + 4
        payload = data[body_start:body_start + clen]
        if len(payload) < clen:
            break  # truncated record
        out.append({
            "warc_type": headers.get("WARC-Type"),
            "url": headers.get("WARC-Target-URI"),
            "warc_date": headers.get("WARC-Date"),
            "record_id": headers.get("WARC-Record-ID"),
            "content_type": headers.get("Content-Type"),
            "content_length": clen,
            "headers": headers,
            "payload": payload,
        })
        pos = body_start + clen
    return out


def read_warc(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    types: tuple[str, ...] | None = None,
) -> DataFrame:
    """WARC directory → one row per record.

    ``types`` filters on WARC-Type ("response", "request", "warcinfo",
    "metadata", ...) INSIDE the parser, before rows materialize — the
    cheap half of predicate pushdown a binary format allows."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def parse(batches):
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for i, rec in enumerate(parse_warc_bytes(bytes(content))):
                    if types and rec["warc_type"] not in types:
                        continue
                    rec = dict(rec)
                    rec["file"] = path_
                    rec["record_idx"] = i
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return files.mapInPandas(parse, WARC_SCHEMA)
