"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, ``mapInPandas``
signatures, partition sizing — is real and tested, and the decode step is
REAL wherever the stdlib can express it (all format layouts below are
public specifications):

- **PNG**: full decode for the common case (8-bit gray/RGB/±alpha,
  non-interlaced) — IHDR header parse + ``zlib`` IDAT inflate + scanline
  unfiltering — so width/height/mean_luma/phash are all computed from real
  pixels with zero external codecs.
- **JPEG**: real width/height/channels from the SOF0/1/2 frame header
  (marker-segment scan). Entropy decode genuinely needs a codec, so pixel
  features raise ``NotImplementedError``.
- **GIF / BMP**: real width/height from the fixed header layout.
- **WAV (RIFF/WAVE)**: full PCM decode — header params, per-sample
  RMS/peak.
- **AVI (RIFF) video**: real container parse + frame extraction; MPNG
  frames decode to pixels via the PNG codec, MJPG frames give header
  dimensions. Compressed video codecs stay behind the ffmpeg boundary.
- **Resize**: real nearest-neighbor resample for PNG payloads
  (decode → integer-grid index → re-encode).

Anything the stdlib can't decode raises ``NotImplementedError`` at the
exact point where Pillow/ffmpeg would be called — a pipeline can NEVER
ship fake features silently. Passing ``fake=True`` is an explicit opt-in
for plumbing tests and oracle replay: the decoders then produce
deterministic synthetic features derived from the payload bytes.

Scale notes: binary payloads never shuffle through these ops — decode /
feature-extract are map-only (``mapInPandas``), so the only data movement
is the parquet scan and whatever downstream groupBy the features feed.
``spark.sql.files.maxPartitionBytes`` is the knob that keeps a partition of
multi-MB blobs within executor memory.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

IMAGE_FEATURES = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.FloatType()),
    T.StructField("phash", T.LongType()),
])


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type → sample channels (palette handled separately)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_image_header(blob: bytes) -> tuple[str, int, int, int] | None:
    """Pure-stdlib header parse → (format, width, height, channels), or
    None when the payload is not a recognized image container.

    Layouts are the public format specs: PNG IHDR (RFC 2083 §4.1.1), JPEG
    SOF0/1/2 frame segments (ITU T.81 §B.2.2), GIF logical screen
    descriptor, BMP BITMAPINFOHEADER. No codec library involved."""
    if blob.startswith(_PNG_SIG) and len(blob) >= 33 and blob[12:16] == b"IHDR":
        w, h, _depth, color = struct.unpack(">IIBB", blob[16:26])
        return ("png", w, h, _PNG_CHANNELS.get(color, 0))
    if blob[:2] == b"\xff\xd8":  # JPEG SOI; scan marker segments for SOF
        i = 2
        n = len(blob)
        while i + 9 <= n:
            if blob[i] != 0xFF:
                break
            # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
            # marker; treating a fill byte as the marker desyncs the scan.
            while i + 9 <= n and blob[i + 1] == 0xFF:
                i += 1
            if i + 9 > n:
                break
            marker = blob[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2 (baseline/ext/progressive)
                h, w = struct.unpack(">HH", blob[i + 5:i + 9])
                return ("jpeg", w, h, blob[i + 9])
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = struct.unpack(">H", blob[i + 2:i + 4])[0]
            i += 2 + seg_len
        return None
    if blob[:6] in (b"GIF87a", b"GIF89a") and len(blob) >= 10:
        w, h = struct.unpack("<HH", blob[6:10])
        return ("gif", w, h, 3)
    if blob[:2] == b"BM" and len(blob) >= 26:
        w, h = struct.unpack("<ii", blob[18:26])
        return ("bmp", w, abs(h), 3)
    return None


def _png_unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Reverse PNG scanline filtering (types 0-4, spec §6) → H×W×ch uint8."""
    stride = w * ch
    flat = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1))
    rows = flat.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    if not ftypes.any():
        # all-None-filter image (the common case for small/synthetic PNGs):
        # one reshape, no per-scanline Python loop
        return rows[:, 1:].copy().reshape(h, w, ch)
    if (ftypes == 2).all():
        # all-Up: unfiltering is a running column sum mod 256 — uint8
        # overflow IS mod-256 arithmetic, so cumsum in uint8 is exact
        return np.cumsum(rows[:, 1:], axis=0, dtype=np.uint8) \
            .reshape(h, w, ch)
    out = np.empty((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ftype == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        elif ftype != 0:
            raise NotImplementedError(f"unknown PNG filter type {ftype}")
        out[y] = line
        prev = line
    return out.reshape(h, w, ch)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an H×W×C uint8 array (C ∈ {1,2,3,4}) as a PNG, stdlib-only.

    ``filter_type`` applies one scanline filter (0-4) to every row — mainly
    useful to exercise every unfilter path in :func:`decode_png_pixels`;
    real encoders pick per-row, which changes size, not semantics."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    if filter_type == 0:
        # vectorized common case: filter byte column + raw scanlines
        rows = np.concatenate(
            [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * ch)],
            axis=1,
        )
        ihdr0 = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (_PNG_SIG + chunk(b"IHDR", ihdr0)
                + chunk(b"IDAT", zlib.compress(rows.tobytes()))
                + chunk(b"IEND", b""))
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int32)
        f = line.copy()
        if filter_type == 1:
            f[ch:] = (line[ch:] - line[:-ch]) % 256
        elif filter_type == 2:
            f = (line - prev) % 256
        elif filter_type == 3:
            for x in range(w * ch):
                left = int(line[x - ch]) if x >= ch else 0
                f[x] = (int(line[x]) - (left + int(prev[x])) // 2) % 256
        elif filter_type == 4:
            for x in range(w * ch):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                f[x] = (int(line[x]) - pred) % 256
        raw += bytes([filter_type]) + bytes(f.astype(np.uint8))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def decode_png_pixels(blob: bytes) -> np.ndarray:
    """Full stdlib PNG decode for the common case: 8-bit depth, color type
    gray/RGB/gray+alpha/RGBA, non-interlaced. Returns H×W×C uint8."""
    hdr = parse_image_header(blob)
    if hdr is None or hdr[0] != "png":
        raise NotImplementedError("not a PNG payload")
    depth, color, _comp, _filt, interlace = struct.unpack(">BBBBB", blob[24:29])
    if depth != 8 or color == 3 or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} color_type={color} interlace={interlace} "
            f"needs a real codec (stdlib path covers 8-bit truecolor/gray)"
        )
    _, w, h, ch = hdr
    idat = bytearray()
    i = 8
    while i + 8 <= len(blob):
        (clen,) = struct.unpack(">I", blob[i:i + 4])
        ctype = blob[i + 4:i + 8]
        if ctype == b"IDAT":
            idat += blob[i + 8:i + 8 + clen]
        if ctype == b"IEND":
            break
        i += 12 + clen  # length + type + data + CRC
    raw = zlib.decompress(bytes(idat))
    return _png_unfilter(raw, w, h, ch)


def _luma(px: np.ndarray) -> np.ndarray:
    """H×W float64 luma in [0,1] (Rec. 601 weights for color images)."""
    if px.shape[2] >= 3:
        y = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    else:
        y = px[:, :, 0].astype(np.float64)
    return y / 255.0


def _ahash64(y: np.ndarray) -> int:
    """8×8 average-hash over a luma plane → signed int64 (MSB-first bits).

    Block-mean downsample on an even index grid — pure integer index math,
    so the result is identical on every executor / platform."""
    h, w = y.shape
    ri = np.linspace(0, h, 9).astype(int)
    ci = np.linspace(0, w, 9).astype(int)
    if h >= 8 and w >= 8:
        # strictly increasing grid → block means via two reduceat passes
        # (no per-block Python loop)
        sums = np.add.reduceat(
            np.add.reduceat(y, ri[:-1], axis=0), ci[:-1], axis=1)
        grid = sums / np.outer(np.diff(ri), np.diff(ci))
    else:
        grid = np.empty((8, 8))
        for a in range(8):
            for b in range(8):
                block = y[ri[a]:max(ri[a + 1], ri[a] + 1),
                          ci[b]:max(ci[b + 1], ci[b] + 1)]
                grid[a, b] = block.mean()
    bits = (grid > grid.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def _real_decode(blob: bytes) -> tuple[int, int, float, int]:
    """Real feature extraction where the stdlib can: full PNG decode; for
    other recognized containers the pixel features need a codec."""
    hdr = parse_image_header(blob)
    if hdr is None:
        raise NotImplementedError(
            "unrecognized image container — not PNG/JPEG/GIF/BMP"
        )
    fmt, w, h, _ch = hdr
    if fmt != "png":
        raise NotImplementedError(
            f"{fmt} pixel decode needs a real codec (header gives "
            f"{w}x{h}; use decode_image_meta for header-only features)"
        )
    y = _luma(decode_png_pixels(blob).astype(np.float64))
    return w, h, float(round(y.mean(), 6)), _ahash64(y)


def decode_image_meta(df: DataFrame, blob_col: str = "image",
                      out: str = "meta") -> DataFrame:
    """binary blob → (width, height, format) from the container header —
    REAL for PNG/JPEG/GIF/BMP, no codec library, map-only. Unrecognized
    payloads yield a NULL struct (filterable, never fabricated)."""
    out_schema = T.StructType(
        [f for f in df.schema.fields] + [T.StructField(out, IMAGE_META)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            metas = []
            for blob in pdf[blob_col]:
                hdr = parse_image_header(bytes(blob)) if blob is not None else None
                metas.append(
                    None if hdr is None
                    else {"format": hdr[0], "width": hdr[1], "height": hdr[2]}
                )
            yield pdf.assign(**{out: metas})

    return df.mapInPandas(run, out_schema)


def _fake_decode(blob: bytes) -> tuple[int, int, float, int]:
    """Deterministic stand-in for a real image decode (STUB)."""
    d = hashlib.sha256(blob).digest()
    w = 64 + d[0] % 192
    h = 64 + d[1] % 192
    luma = d[2] / 255.0
    phash = int.from_bytes(d[3:11], "big", signed=True)
    return w, h, luma, phash


def decode_image_features(df: DataFrame, blob_col: str = "image",
                          out: str = "img", fake: bool = False) -> DataFrame:
    """binary blob → typed feature struct via one map-only Arrow stage."""
    out_schema = T.StructType(
        [f for f in df.schema.fields] + [T.StructField(out, IMAGE_FEATURES)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            feats = []
            for blob in pdf[blob_col]:
                if blob is None:
                    feats.append(None)
                    continue
                if fake:
                    w, h, luma, ph = _fake_decode(bytes(blob))
                else:
                    w, h, luma, ph = _real_decode(bytes(blob))
                feats.append({"width": w, "height": h,
                              "mean_luma": float(luma), "phash": ph})
            yield pdf.assign(**{out: feats})

    return df.mapInPandas(run, out_schema)


def resize_pixels(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an H×W×C uint8 array — pure integer
    index math (source index = (dst·src_dim)//dst_dim, the same even-grid
    rule as :func:`sample_frame_indices`), so results are identical on
    every executor and closed-form replayable."""
    h, w = px.shape[:2]
    ri = (np.arange(height) * h) // height
    ci = (np.arange(width) * w) // width
    return px[ri][:, ci]


def resize_images(df: DataFrame, blob_col: str = "image", out: str = "resized",
                  width: int = 224, height: int = 224, fake: bool = False) -> DataFrame:
    """binary → binary resize, map-only.

    REAL path (default): full PNG decode → nearest-neighbor resample on
    the integer grid (:func:`resize_pixels`) → PNG re-encode, all stdlib.
    Non-PNG payloads raise at the exact point a codec library would be
    called (JPEG entropy decode etc.) — never fabricates. ``fake=True``
    keeps the deterministic sha256 plumbing twin."""
    out_schema = T.StructType(
        [f for f in df.schema.fields] + [T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            blobs = []
            for blob in pdf[blob_col]:
                if blob is None:
                    blobs.append(None)
                    continue
                if fake:
                    seed = hashlib.sha256(
                        bytes(blob) + f"|{width}x{height}".encode()
                    ).digest()
                    blobs.append(seed * 4)  # deterministic fake payload
                    continue
                px = decode_png_pixels(bytes(blob))  # raises for non-PNG
                blobs.append(encode_png(resize_pixels(px, width, height)))
            yield pdf.assign(**{out: blobs})

    return df.mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# video (RIFF/AVI — the container layout is a public specification: the AVI
# RIFF form from the Video for Windows SDK / OpenDML AVI spec. Container
# parse + frame extraction are fully stdlib-expressible; decoding the frame
# payloads themselves then reuses the image codecs above, so an AVI whose
# frames are PNG blobs ("motion PNG", fourcc MPNG) round-trips to real
# pixels with zero external libraries, and MJPG frames yield real
# dimensions via the JPEG header scan.)
# ---------------------------------------------------------------------------

VIDEO_META = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("usec_per_frame", T.LongType()),
    T.StructField("codec", T.StringType()),
])


def encode_avi(frames: list[bytes], width: int, height: int,
               fps: int = 10, codec: bytes = b"MPNG") -> bytes:
    """Encode pre-compressed frame blobs as a spec-valid AVI, stdlib-only.

    Layout per the public AVI RIFF form: RIFF('AVI ') → LIST('hdrl') with
    the 56-byte main header (``avih``) and one video stream
    (LIST('strl') → ``strh`` + BITMAPINFOHEADER ``strf``) → LIST('movi')
    with one word-aligned ``00dc`` chunk per frame → ``idx1`` index."""

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(form: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", form + data)

    n = len(frames)
    usec = 1_000_000 // fps
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack("<10I4I", usec, max_bytes * fps, 0, 0x10, n, 0, 1,
                       max_bytes, width, height, 0, 0, 0, 0)
    strh = struct.pack("<4s4sI2H8I4h", b"vids", codec, 0, 0, 0, 0,
                       1, fps, 0, n, max_bytes, 0xFFFFFFFF, 0,
                       0, 0, width, height)
    strf = struct.pack("<I2i2H2I2i2I", 40, width, height, 1, 24,
                       struct.unpack("<I", codec)[0], width * height * 3,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"movi"
    idx = b""
    for f in frames:
        # idx1 offsets point at the chunk id, relative to the 'movi' fourcc
        idx += struct.pack("<4s3I", b"00dc", 0x10, len(movi_body), len(f))
        movi_body += chunk(b"00dc", f)
    body = b"AVI " + hdrl + chunk(b"LIST", movi_body) + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(blob: bytes):
    """RIFF chunk scan → (width, height, n_frames, usec_per_frame, codec,
    [frame blobs]), or None when the payload is not RIFF/AVI.

    Reads the ``avih`` main header for dimensions and timing, ``strh`` of
    the first ``vids`` stream for the codec fourcc, and collects every
    ``..dc``/``..db`` chunk inside LIST('movi') as a frame payload. Chunks
    are word-aligned (the pad byte is not part of the payload)."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        return None
    width = height = usec = 0
    n_frames = 0
    codec = ""
    frames: list[bytes] = []

    # Iterative scan with an explicit (lo, hi) work stack: LIST chunks
    # nest, and a recursive scan over UNTRUSTED crawled bytes let a ~24 KB
    # blob of nested LIST('strl') headers raise RecursionError — crashing
    # the executor task instead of yielding the documented NULL struct.
    # The stack bounds memory to O(nesting) and cannot overflow; ranges
    # strictly shrink (data_lo+4 > i), so termination is preserved.
    stack: list[tuple[int, int]] = [(12, len(blob))]
    while stack:
        i, hi = stack.pop()
        while i + 8 <= hi:
            cid = blob[i:i + 4]
            (clen,) = struct.unpack("<I", blob[i + 4:i + 8])
            data_lo = i + 8
            data_hi = min(data_lo + clen, hi)
            nxt = data_lo + clen + (clen & 1)
            if cid == b"LIST":
                form = blob[data_lo:data_lo + 4]
                if form in (b"hdrl", b"movi", b"strl"):
                    # descend now, resume the parent after the child —
                    # the exact depth-first in-order walk of the old
                    # recursive form (frame order / first-strh selection
                    # unchanged)
                    stack.append((nxt, hi))
                    i, hi = data_lo + 4, data_hi
                    continue
            elif cid == b"avih" and clen >= 40 and data_hi - data_lo >= 40:
                # guard on bytes ACTUALLY present: a truncated/adversarial
                # blob can declare clen >= 40 with fewer payload bytes —
                # struct.unpack on the short slice raised struct.error and
                # crashed the task (same untrusted-input class as the
                # recursion fix); short chunks are simply unrecognized
                usec, _mb, _pg, _fl, n_frames = struct.unpack(
                    "<5I", blob[data_lo:data_lo + 20])
                width, height = struct.unpack(
                    "<2I", blob[data_lo + 32:data_lo + 40])
            elif cid == b"strh" and clen >= 8 and not codec:
                if blob[data_lo:data_lo + 4] == b"vids":
                    codec = blob[data_lo + 4:data_lo + 8].decode(
                        "ascii", "replace").strip("\x00 ") or "DIB"
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append(blob[data_lo:data_hi])
            i = nxt
    if width == 0 and not frames:
        return None
    return width, height, n_frames or len(frames), usec, codec, frames


def decode_video_meta(df: DataFrame, blob_col: str = "video",
                      out: str = "meta") -> DataFrame:
    """video binary → (width, height, n_frames, usec_per_frame, codec)
    from the AVI container header — REAL, stdlib-only, map-only.
    Unrecognized payloads yield a NULL struct (filterable, never
    fabricated)."""
    out_schema = T.StructType(
        [f for f in df.schema.fields] + [T.StructField(out, VIDEO_META)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            metas = []
            for blob in pdf[blob_col]:
                p = parse_avi(bytes(blob)) if blob is not None else None
                metas.append(
                    None if p is None
                    else {"width": p[0], "height": p[1], "n_frames": p[2],
                          "usec_per_frame": p[3], "codec": p[4]}
                )
            yield pdf.assign(**{out: metas})

    return df.mapInPandas(run, out_schema)


def sample_frame_indices(total: int, k: int) -> list[int]:
    """Evenly-spaced frame sample: the first frame of each of ``k`` equal
    buckets — pure integer index math ((j·total)//k), so the selection is
    identical on every executor and closed-form replayable in SQL."""
    k = min(k, total)
    return [(j * total) // k for j in range(k)]


def sample_video_frames(df: DataFrame, blob_col: str = "video",
                        out: str = "frames", n_frames: int = 4,
                        fake: bool = False) -> DataFrame:
    """video binary → array of frame blobs, 1 row → 1 row with array column.

    REAL path (default): parse the AVI container (public RIFF spec, stdlib
    struct scan — no ffmpeg) and return ``n_frames`` evenly-sampled frame
    payloads (see :func:`sample_frame_indices`). The payloads are whatever
    the stream carries — PNG blobs (fourcc MPNG) decode to real pixels via
    :func:`decode_png_pixels`; MJPG blobs give real dimensions via
    :func:`parse_image_header`. Non-AVI payloads raise at the exact point
    a real codec would be needed. ``fake=True`` keeps the deterministic
    sha256 plumbing twin for schema/batch-shape tests."""
    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField(out, T.ArrayType(T.BinaryType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            col = []
            for blob in pdf[blob_col]:
                if blob is None:
                    col.append(None)
                    continue
                if fake:
                    col.append([
                        hashlib.sha256(bytes(blob) + bytes([k])).digest()
                        for k in range(n_frames)
                    ])
                    continue
                p = parse_avi(bytes(blob))
                if p is None:
                    raise NotImplementedError(
                        "unrecognized video container — not RIFF/AVI "
                        "(other containers need ffmpeg)"
                    )
                frames = p[5]
                col.append([frames[i] for i in
                            sample_frame_indices(len(frames), n_frames)])
            yield pdf.assign(**{out: col})

    return df.mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# audio (RIFF/WAVE — fully decodable with the stdlib: the container layout
# and PCM sample encoding are public specifications, no codec involved)
# ---------------------------------------------------------------------------

AUDIO_FEATURES = T.StructType([
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("bits", T.IntegerType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("duration_ms", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.IntegerType()),
])


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode PCM samples as a canonical RIFF/WAVE blob, stdlib-only.

    ``samples``: int16 array of shape (n_frames,) or (n_frames, channels);
    uint8 arrays encode as 8-bit PCM (the WAV unsigned convention)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if s.dtype == np.uint8:
        bits, data = 8, s.tobytes()
    else:
        bits, data = 16, s.astype("<i2").tobytes()
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_header(blob: bytes):
    """RIFF chunk scan → (audio_format, channels, sample_rate, bits,
    data_offset, data_len), or None when the payload is not RIFF/WAVE.
    Chunk layout per the public WAVE spec (RIFF registry, multimedia
    programming interface specification 1.0): 4-byte id + LE u32 size,
    word-aligned; ``fmt `` carries the PCM params, ``data`` the samples."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    fmt_info = None
    data_span = None
    i = 12
    n = len(blob)
    while i + 8 <= n:
        cid = blob[i:i + 4]
        (clen,) = struct.unpack("<I", blob[i + 4:i + 8])
        if cid == b"fmt " and clen >= 16:
            audio_fmt, ch, sr, _br, _ba, bits = struct.unpack(
                "<HHIIHH", blob[i + 8:i + 24])
            fmt_info = (audio_fmt, ch, sr, bits)
        elif cid == b"data":
            data_span = (i + 8, min(clen, n - i - 8))
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt_info is None or data_span is None:
        return None
    return (*fmt_info, *data_span)


def _real_audio_decode(blob: bytes) -> tuple[int, int, int, int, float, float, int]:
    """Real WAV PCM decode: header params + per-sample RMS and peak.
    8-bit (unsigned, centered at 128) and 16-bit LE PCM are the stdlib-
    expressible cases; compressed formats raise at the codec boundary."""
    hdr = parse_wav_header(blob)
    if hdr is None:
        raise NotImplementedError(
            "not a RIFF/WAVE container — mp3/ogg/flac need a real codec"
        )
    audio_fmt, ch, sr, bits, off, dlen = hdr
    if audio_fmt != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"WAV format={audio_fmt} bits={bits} needs a real codec "
            f"(stdlib path covers integer PCM 8/16-bit)"
        )
    if bits == 8:
        x = np.frombuffer(blob, np.uint8, dlen, off).astype(np.float64) - 128.0
    else:
        x = np.frombuffer(blob, "<i2", dlen // 2, off).astype(np.float64)
    n_frames = len(x) // ch
    rms = float(round(np.sqrt(np.mean(x * x)), 6)) if len(x) else 0.0
    peak = int(np.max(np.abs(x))) if len(x) else 0
    duration_ms = round(n_frames * 1000.0 / sr, 6)
    return sr, ch, bits, n_frames, duration_ms, rms, peak


def _fake_audio_decode(blob: bytes) -> tuple[int, int, int, int, float, float, int]:
    """Deterministic stand-in (STUB) — plumbing/oracle twin, like
    :func:`_fake_decode` for images."""
    d = hashlib.sha256(blob).digest()
    sr = 8000 * (1 + d[0] % 6)
    ch = 1 + d[1] % 2
    n_frames = 1000 + int.from_bytes(d[2:4], "big") % 64000
    return (sr, ch, 16, n_frames, round(n_frames * 1000.0 / sr, 6),
            float(d[4]), int(d[5]) * 128)


def decode_audio_features(df: DataFrame, blob_col: str = "audio",
                          out: str = "audio_f", fake: bool = False) -> DataFrame:
    """binary blob → typed audio feature struct, one map-only Arrow stage —
    the audio analogue of :func:`decode_image_features` (same scale shape:
    payloads never shuffle, only the features feed downstream ops). REAL
    for WAV integer PCM; anything needing a codec raises, never fabricates."""
    out_schema = T.StructType(
        [f for f in df.schema.fields] + [T.StructField(out, AUDIO_FEATURES)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            feats = []
            for blob in pdf[blob_col]:
                if blob is None:
                    feats.append(None)
                    continue
                dec = _fake_audio_decode if fake else _real_audio_decode
                sr, ch, bits, nf, dur, rms, peak = dec(bytes(blob))
                feats.append({"sample_rate": sr, "channels": ch, "bits": bits,
                              "n_frames": nf, "duration_ms": dur,
                              "rms": rms, "peak": peak})
            yield pdf.assign(**{out: feats})

    return df.mapInPandas(run, out_schema)
