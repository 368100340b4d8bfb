"""WARC reader (sources/warc.py): plain and gzip, filtering, edge cases."""

from __future__ import annotations

import gzip

from hyped_spark.sources.warc import (
    encode_warc_record,
    parse_warc_bytes,
    read_warc,
)


def _records():
    return [
        ("https://a.example/p1", b"hello world", "response"),
        ("https://b.example/p2", "unicode ü payload".encode(), "response"),
        ("https://a.example/req", b"GET / HTTP/1.1", "request"),
        ("https://c.example/empty", b"", "response"),
        # payload containing bytes that look like a record boundary —
        # Content-Length framing must carry the parser straight across it
        ("https://d.example/tricky", b"x\r\n\r\nWARC/1.0\r\nfake: y", "response"),
    ]


def _blob():
    return b"".join(
        encode_warc_record(u, p, warc_type=t) for u, p, t in _records()
    )


def test_roundtrip_parse():
    recs = parse_warc_bytes(_blob())
    assert [(r["url"], r["payload"], r["warc_type"]) for r in recs] == _records()
    assert all(r["content_length"] == len(r["payload"]) for r in recs)
    assert recs[0]["headers"]["WARC-Date"] == "2024-01-01T00:00:00Z"


def test_gzip_whole_file_and_member_chain():
    plain = parse_warc_bytes(_blob())
    whole = gzip.compress(_blob())
    assert parse_warc_bytes(whole) == plain
    # Common Crawl style: each record its own gzip member, concatenated
    chained = b"".join(
        gzip.compress(encode_warc_record(u, p, warc_type=t))
        for u, p, t in _records()
    )
    assert parse_warc_bytes(chained) == plain


def test_truncated_tail_dropped():
    blob = _blob()
    recs = parse_warc_bytes(blob[: len(blob) - 30])
    assert len(recs) == len(_records()) - 1  # last record incomplete


def test_read_warc_dataframe(spark, tmp_path):
    (tmp_path / "part0.warc").write_bytes(_blob())
    (tmp_path / "part1.warc.gz").write_bytes(gzip.compress(_blob()))
    (tmp_path / "ignore.txt").write_bytes(b"not a warc")

    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 2 * len(_records())
    by_file = {}
    for r in rows:
        by_file.setdefault(r.file.rsplit("/", 1)[-1], []).append(r)
    for fname, rs in by_file.items():
        assert [r.record_idx for r in sorted(rs, key=lambda x: x.record_idx)] \
            == list(range(len(_records())))
    # payloads byte-identical through the Arrow boundary
    got = {(r.url, bytes(r.payload)) for r in rows}
    assert got == {(u, p) for u, p, _ in _records()}

    # type filter prunes inside the parser
    resp = read_warc(spark, str(tmp_path), types=("response",))
    assert resp.count() == 2 * (len(_records()) - 1)
    assert set(r.warc_type for r in resp.collect()) == {"response"}


def test_warc_roundtrip_property():
    """Property: ANY payload bytes — including ones embedding record
    markers, CRLF runs, and gzip magic — survive encode→parse exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.binary(min_size=0, max_size=200), min_size=1,
                    max_size=8))
    def check(payloads):
        blob = b"".join(
            encode_warc_record(f"https://h.example/{i}", p)
            for i, p in enumerate(payloads)
        )
        recs = parse_warc_bytes(blob)
        assert [r["payload"] for r in recs] == payloads
        assert [r["url"] for r in recs] == [
            f"https://h.example/{i}" for i in range(len(payloads))
        ]

    check()
