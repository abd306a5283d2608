"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, Arrow batch shapes, partitioning,
UDF signatures) is real and tested. Decode status, honestly stated:

- **Real decode** exists for the raw public formats that need no
  external library: binary PPM (``P6``) and uncompressed 24-bit BMP —
  ``decode_image_pixels`` parses the actual byte layout (headers,
  row padding, bottom-up rows, BGR order) with numpy and emits
  width/height plus exact per-channel pixel sums.
- **Real PNG decode** (stdlib ``zlib`` only): ``_decode_rgb`` walks
  the chunk stream, CRC-checks every chunk, inflates the IDAT
  stream, and unfilters all five scanline filter types (None / Sub /
  Up / Average / Paeth) across the format's FULL shape surface
  (round 5): every color type — grayscale, RGB, palette (PLTE
  lookup), gray+alpha, RGBA (alpha stripped) — bit depths
  1/2/4/8/16 (high byte for 16-bit, exact rescale for sub-8 gray),
  and Adam7 interlacing (7 passes unfiltered as independent
  sub-images, then scattered).
- **Real JPEG decode** (round 5, ``operators/jpeg.py``): full
  marker walk, DHT-rebuilt canonical Huffman entropy decode with
  DC prediction / restart markers / byte unstuffing, chroma
  subsampling (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), progressive (SOF2)
  multi-scan spectral selection + successive approximation,
  dequant, float IDCT, YCbCr->RGB — arithmetic-coded / lossless
  JPEG still raises a clearly-marked NotImplementedError (an image
  library's job), and
  ``decode_image_features(fake=True)`` remains the deterministic
  sha256 stand-in so downstream operators (dedup, ANN) are
  exercised end-to-end regardless.

At 100 TB, media bytes dominate IO: keep blobs in their own column
(Parquet column pruning skips them for metadata-only queries), size
`spark.sql.files.maxPartitionBytes` so one task holds a bounded number
of blobs, and cap Arrow batches (session.py) so a batch of large blobs
fits executor memory.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

__all__ = ["MEDIA_SCHEMA", "attach_media_blob", "media_metadata",
           "decode_image_features", "decode_image_pixels",
           "synth_ppm_blob", "synth_png_blob", "synth_png_blob_variants",
           "frame_sample_stub",
           "synth_wav_blob", "decode_audio_features",
           "synth_y4m_blob", "frame_sample_real",
           "ahash_bits", "image_ahash",
           "afp_bits", "audio_fingerprint", "scene_cuts",
           "audio_energy_windows", "shot_keyframes"]

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("media_type", StringType(), False),   # image|audio|video
    StructField("blob", BinaryType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])


def attach_media_blob(df: DataFrame, text_col: str = "text",
                      media_type: str = "image") -> DataFrame:
    """Synthesize a deterministic binary blob column from text (stand-in
    for real media bytes; exercises BinaryType through Arrow)."""
    return (df
            .withColumn("media_type", F.lit(media_type))
            .withColumn("blob", F.encode(F.col(text_col), "UTF-8"))
            .withColumn("width", (F.length(text_col) % 640 + 1).cast("int"))
            .withColumn("height", (F.length(text_col) % 480 + 1).cast("int"))
            .withColumn("duration_ms", F.lit(None).cast("int")))


def media_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Metadata-only pass: byte length + sha256 — JVM-side, and Parquet
    column pruning means a metadata query never reads other columns."""
    return df.withColumn("n_bytes", F.length(F.col(blob_col)).cast("long")) \
             .withColumn("sha", F.sha2(F.col(blob_col), 256))


def _decode_rgb(b: bytes) -> tuple[int, int, "np.ndarray"]:
    """REAL image decode for the two lib-free public formats.

    - binary PPM (``P6``, Netpbm spec): ASCII header of width, height,
      maxval (with ``#`` comment support), then ``w*h*3`` raw RGB
      samples — one byte for maxval 255, two big-endian bytes for
      maxval up to 65535 (rescaled exactly to 8-bit);
    - uncompressed 24-bit BMP (BITMAPINFOHEADER): pixel-array offset at
      byte 10, width/height at 18/22, bottom-up rows padded to 4 bytes,
      BGR sample order — all normalized here to a top-down RGB array.

    Returns ``(width, height, pixels[h, w, 3] uint8)``. Raises
    ValueError on malformed input and NotImplementedError for formats
    that genuinely need an image library (JPEG/...).
    """
    if b[:2] == b"P6":
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(b) and b[pos:pos + 1].isspace():
                pos += 1
            if b[pos:pos + 1] == b"#":               # comment to EOL
                pos = b.index(b"\n", pos) + 1
                continue
            end = pos
            while end < len(b) and not b[end:end + 1].isspace():
                end += 1
            fields.append(int(b[pos:end]))
            pos = end
        pos += 1                                      # single ws after maxval
        w, h, maxval = fields
        if maxval == 255:
            n = w * h * 3
            if len(b) - pos < n:
                raise ValueError("PPM truncated pixel array")
            px = np.frombuffer(b, dtype=np.uint8, count=n, offset=pos)
            return w, h, px.reshape(h, w, 3)
        if 255 < maxval < 65536:
            # two-byte big-endian samples (Netpbm spec); normalize to
            # 8-bit the way the 16-bit PNG path does: high byte when
            # maxval is full-range, else exact v*255//maxval
            n = w * h * 3
            if len(b) - pos < 2 * n:
                raise ValueError("PPM truncated pixel array")
            px = np.frombuffer(b, dtype=">u2", count=n, offset=pos) \
                .astype(np.int64)
            px = (px * 255) // maxval
            return w, h, px.astype(np.uint8).reshape(h, w, 3)
        raise ValueError(f"PPM maxval {maxval} invalid")
    if b[:2] == b"BM":
        off = int.from_bytes(b[10:14], "little")
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        bpp = int.from_bytes(b[28:30], "little")
        comp = int.from_bytes(b[30:34], "little")
        if bpp != 24 or comp != 0:
            raise ValueError(f"BMP bpp={bpp} compression={comp} "
                             "unsupported (24-bit uncompressed only)")
        top_down = h < 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3
        raw = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
        rows = raw.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
        if not top_down:
            rows = rows[::-1]
        return w, h, rows[:, :, ::-1]                 # BGR → RGB
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(b)
    if b[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg
        return decode_jpeg(b)
    raise NotImplementedError(
        "only PPM(P6)/BMP-24/PNG/JPEG (baseline + progressive) decode "
        "without an image library (WebP / AVIF / ... need PIL/libvips, "
        "not in this container)")


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# channels per PNG color type (0 gray, 2 RGB, 3 palette, 4 gray+alpha,
# 6 RGBA) and the valid bit depths per type (W3C PNG §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}
# Adam7 pass origins/steps (W3C PNG §8.2): (x0, y0, dx, dy)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(raw: bytes, h: int, stride: int,
                  bpp: int) -> "np.ndarray":
    """Undo the five scanline filters over one (sub-)image of ``h``
    rows of ``stride`` filtered bytes each; ``bpp`` is the filter
    pixel width in bytes (>=1 even for sub-byte depths)."""
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    for y in range(h):
        ft = int(arr[y, 0])
        row = arr[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride,
                                                              np.int32)
        if ft == 0:
            cur = row
        elif ft == 2:                                  # Up
            cur = (row + prev) & 0xFF
        elif ft == 1:                                  # Sub: per-lane cumsum
            pad = (-stride) % bpp
            lanes = np.concatenate([row, np.zeros(pad, np.int32)])
            cur = np.cumsum(lanes.reshape(-1, bpp),
                            axis=0).reshape(-1)[:stride] & 0xFF
        else:                                          # Average / Paeth:
            cur = np.empty(stride, np.int32)           # left-dependency loop
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                if ft == 3:
                    v = row[x] + ((a + up) >> 1)
                elif ft == 4:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else \
                        (up if pb <= pc else c)
                    v = row[x] + pred
                else:
                    raise ValueError(f"PNG filter type {ft} invalid")
                cur[x] = v & 0xFF
        out[y] = cur.astype(np.uint8)
    return out


def _png_rows_to_px(rows: "np.ndarray", w: int, h: int, depth: int,
                    ctype: int, palette) -> "np.ndarray":
    """Unfiltered rows -> (h, w, 3) uint8 RGB: unpack sub-byte
    samples (MSB first), take the high byte of 16-bit samples,
    rescale sub-8-bit grayscale to full range (v*255/(2^d-1), exact
    in integers), look up palette indices, strip alpha."""
    ch = _PNG_CHANNELS[ctype]
    if depth == 16:
        vals = rows.reshape(h, w, ch, 2)[..., 0]
    elif depth == 8:
        vals = rows.reshape(h, w, ch)
    else:                                   # 1/2/4-bit gray or palette
        per_byte = 8 // depth
        shifts = (np.arange(per_byte - 1, -1, -1) * depth).astype(np.uint8)
        mask = (1 << depth) - 1
        expanded = (rows[:, :, None] >> shifts[None, None, :]) & mask
        vals = expanded.reshape(h, -1)[:, :w][..., None]
    if ctype == 0:
        g = vals[..., 0].astype(np.int64)
        if depth < 8:
            g = (g * 255) // ((1 << depth) - 1)
        return np.repeat(g[..., None], 3, axis=2).astype(np.uint8)
    if ctype == 3:
        if palette is None:
            raise ValueError("PNG palette image missing PLTE")
        idx = vals[..., 0].astype(np.int64)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("PNG palette index out of range")
        return palette[idx]
    if ctype == 4:
        return np.repeat(vals[..., 0:1], 3, axis=2).astype(np.uint8)
    return np.ascontiguousarray(vals[..., :3]).astype(np.uint8)


def _decode_png(b: bytes) -> tuple[int, int, "np.ndarray"]:
    """REAL PNG decode with stdlib ``zlib`` only (the format's public
    spec: RFC 2083 / W3C PNG). Chunk walk with per-chunk CRC32
    verification, concatenated-IDAT inflate, full scanline
    unfiltering for all five filter types, every color type
    (grayscale, RGB, palette, gray+alpha, RGBA — alpha stripped),
    bit depths 1/2/4/8/16 (16-bit samples take the high byte;
    sub-8-bit grayscale rescales exactly), and Adam7 interlacing
    (each of the 7 passes unfiltered as its own sub-image, then
    scattered). Raises ValueError on malformed bytes so the
    mapInPandas quarantine path stays total."""
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos:pos + 4], "big")
        typ = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + ln]
        if len(data) < ln or pos + 12 + ln > len(b):
            raise ValueError("PNG truncated chunk")
        crc = int.from_bytes(b[pos + 8 + ln:pos + 12 + ln], "big")
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"PLTE":
            if len(data) % 3 or len(data) > 768:
                raise ValueError("PNG PLTE size invalid")
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, comp, filt, interlace = ihdr[8:13]
    if comp != 0 or filt != 0:
        raise ValueError("PNG nonstandard compression/filter method")
    if ctype not in _PNG_CHANNELS or depth not in _PNG_DEPTHS[ctype]:
        raise ValueError(
            f"PNG depth={depth} color_type={ctype} combination invalid")
    if interlace not in (0, 1):
        raise NotImplementedError(
            f"PNG interlace method {interlace} unsupported")
    if w <= 0 or h <= 0:
        raise ValueError("PNG zero dimension")
    bits_pp = depth * _PNG_CHANNELS[ctype]
    fbpp = max(1, bits_pp // 8)                 # filter pixel width
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        stride = (w * bits_pp + 7) // 8
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG decompressed size mismatch")
        rows = _png_unfilter(raw, h, stride, fbpp)
        return w, h, _png_rows_to_px(rows, w, h, depth, ctype, plte)
    px = np.zeros((h, w, 3), np.uint8)          # Adam7
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * bits_pp + 7) // 8
        need = ph * (stride + 1)
        if off + need > len(raw):
            raise ValueError("PNG decompressed size mismatch")
        rows = _png_unfilter(raw[off:off + need], ph, stride, fbpp)
        off += need
        px[y0::dy, x0::dx] = _png_rows_to_px(rows, pw, ph, depth,
                                             ctype, plte)
    if off != len(raw):
        raise ValueError("PNG decompressed size mismatch")
    return w, h, px


def decode_image_pixels(df: DataFrame, blob_col: str = "blob",
                        key_cols=("doc_id",)) -> DataFrame:
    """Real decode stage: parse each blob's actual byte layout
    (PPM P6 / BMP-24, see ``_decode_rgb``) and emit integer-exact
    witnesses — width, height, and per-channel pixel sums.

    Scale shape: mapInPandas with only (keys, blob) selected, so
    Parquet column pruning never reads unrelated columns; per-image
    work is numpy array arithmetic (no per-pixel Python). Output rows
    are tiny (5 ints) regardless of blob size, so whatever follows
    (joins, aggs) shuffles metadata, never media bytes."""
    key_cols = list(key_cols)
    schema = StructType(
        [df.schema[k] for k in key_cols] + [
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("sum_r", LongType(), True),
            StructField("sum_g", LongType(), True),
            StructField("sum_b", LongType(), True),
        ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict = {k: pdf[k] for k in key_cols}
            w_, h_, r_, g_, b_ = [], [], [], [], []
            for blob in pdf[blob_col]:
                if blob is None:
                    w_.append(None); h_.append(None)
                    r_.append(None); g_.append(None); b_.append(None)
                    continue
                w, h, px = _decode_rgb(bytes(blob))
                s = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                w_.append(w); h_.append(h)
                r_.append(int(s[0])); g_.append(int(s[1])); b_.append(int(s[2]))
            out = pd.DataFrame(cols)
            out["width"], out["height"] = w_, h_
            out["sum_r"], out["sum_g"], out["sum_b"] = r_, g_, b_
            yield out

    return df.select(*key_cols, blob_col).mapInPandas(fn, schema)


def ahash_bits(w: int, h: int, px: "np.ndarray", grid: int = 8) -> int:
    """Integer-exact average-hash of one decoded RGB image: gray =
    (r+g+b)//3; cell (gy,gx) = floor-mean of gray over the pixels
    binned by floor(y*grid/h), floor(x*grid/w) (empty cells for
    images smaller than the grid read 0); global mean = floor-mean of
    the grid; bit = cell > mean, packed row-major from bit 63 down,
    returned as two's-complement int64. Every step is integer
    arithmetic, so any engine replays the hash bit-for-bit."""
    gray = px.reshape(h, w, 3).sum(axis=2, dtype=np.int64) // 3
    gy = (np.arange(h, dtype=np.int64) * grid) // h
    gx = (np.arange(w, dtype=np.int64) * grid) // w
    cell_id = (gy[:, None] * grid + gx[None, :]).ravel()
    # int64 scatter-add, NOT bincount(weights=...): bincount
    # accumulates in float64, which would silently break the
    # bit-for-bit integer claim once a cell sum crossed 2^53
    sums = np.zeros(grid * grid, dtype=np.int64)
    np.add.at(sums, cell_id, gray.ravel())
    counts = np.bincount(cell_id, minlength=grid * grid)
    cells = np.where(counts > 0, sums // np.maximum(counts, 1), 0)
    return _pack_bits(cells)


def _pack_bits(cells: "np.ndarray") -> int:
    """Shared signature epilogue (image aHash / audio fingerprint):
    global mean = floor-mean of the cells, bit = cell > mean, packed
    from bit 63 down, returned as two's-complement int64. One
    definition so the bit-for-bit recipe every oracle replays cannot
    drift between modalities."""
    mean = int(cells.sum()) // len(cells)
    val = 0
    for i, c in enumerate(cells):
        if int(c) > mean:
            val |= 1 << (63 - i)
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def _mono_envelope(ch: int, samples: "np.ndarray") -> "np.ndarray":
    """Shared mono energy envelope (audio fingerprint / VAD):
    m[t] = (sum over channels of |sample|) // ch over interleaved
    16-bit PCM, int64 throughout."""
    a = np.abs(samples.astype(np.int64))
    t = len(a) // ch
    return a[:t * ch].reshape(t, ch).sum(axis=1) // ch


def image_ahash(df: DataFrame, blob_col: str = "blob",
                key_cols=("doc_id",), grid: int = 8) -> DataFrame:
    """Perceptual average-hash per image: decode the real container
    (PPM/BMP via ``_decode_rgb``) and emit a 64-bit aHash — the
    standard near-duplicate-image signature (resize-robust: the
    grid binning IS the downsample). Feed the result to
    ``dedup.hamming_candidates`` for capped pigeonhole bucketing —
    the same scale-safe kernel the text SimHash path uses, so image
    near-dup inherits its hot-bucket behavior.

    Scale shape: mapInPandas over (keys, blob) only — media bytes
    never outlive the stage; output is (keys, 8-byte hash), so the
    downstream candidate join shuffles signatures, never pixels."""
    key_cols = list(key_cols)
    schema = StructType(
        [df.schema[k] for k in key_cols] + [
            StructField("ahash", LongType(), True),
        ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({k: pdf[k] for k in key_cols})
            vals = []
            for blob in pdf[blob_col]:
                try:
                    if blob is None:
                        raise ValueError("null blob")
                    w, h, px = _decode_rgb(bytes(blob))
                    vals.append(ahash_bits(w, h, px, grid))
                except (ValueError, NotImplementedError):
                    # malformed OR lib-gated format (JPEG): null the
                    # signature, never crash the task — same
                    # quarantine policy as the audio/video siblings
                    vals.append(None)
            out["ahash"] = pd.Series(vals, dtype="object")
            yield out

    return df.select(*key_cols, blob_col).mapInPandas(fn, schema)


def synth_ppm_blob(df: DataFrame, id_col: str = "doc_id",
                   blob_col: str = "blob",
                   seed_col: Optional[str] = None) -> DataFrame:
    """Deterministic test/bench image source: a real binary-PPM blob
    per row, sized ``w=(s%13)+4, h=(s%11)+4`` with pixel byte
    ``i = (s*7 + i*31) % 256`` — a closed arithmetic form an external
    oracle can replay without any image code. The blobs are REAL PPM
    files (header + raw RGB), so the decode stage exercises actual
    format parsing, not a hash of the input. ``s`` is ``seed_col``
    when given (lets a wrapper plant a small set of image CLASSES
    while keeping real row ids) else ``id_col``."""
    key = df.schema[id_col]
    schema = StructType([key, StructField(blob_col, BinaryType(), False)])
    seed = seed_col or id_col
    cols = [id_col] if seed == id_col else [id_col, seed]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for i in pdf[seed]:
                i = int(i)
                w, h = i % 13 + 4, i % 11 + 4
                n = w * h * 3
                px = (i * 7 + 31 * np.arange(n, dtype=np.int64)) % 256
                blobs.append(b"P6\n%d %d\n255\n" % (w, h)
                             + px.astype(np.uint8).tobytes())
            yield pd.DataFrame({id_col: pdf[id_col], blob_col: blobs})

    return df.select(*cols).mapInPandas(fn, schema)


def _png_filter_row(row: "np.ndarray", prev: "np.ndarray", ft: int,
                    bpp: int) -> "np.ndarray":
    """Apply PNG scanline filter ``ft`` to a raw row (encoder side).
    All five filters are closed-form in the RAW bytes of the current
    and previous rows, so this is fully vectorized."""
    r = row.astype(np.int32)
    a = np.concatenate([np.zeros(bpp, np.int32), r[:-bpp]])
    up = prev.astype(np.int32)
    c = np.concatenate([np.zeros(bpp, np.int32), up[:-bpp]])
    if ft == 0:
        out = r
    elif ft == 1:
        out = r - a
    elif ft == 2:
        out = r - up
    elif ft == 3:
        out = r - ((a + up) >> 1)
    else:                                              # Paeth
        p = a + up - c
        pa, pb, pc = np.abs(p - a), np.abs(p - up), np.abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), a,
                        np.where(pb <= pc, up, c))
        out = r - pred
    return (out & 0xFF).astype(np.uint8)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (len(data).to_bytes(4, "big") + typ + data
            + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big"))


def _png_encode(w: int, h: int, px: "np.ndarray",
                filters=None) -> bytes:
    """Minimal REAL PNG encoder (stdlib zlib): 8-bit RGB, one IDAT,
    per-row filter types from ``filters`` (default: cycle 0..4 so a
    decoder must implement every unfilter path to read it back)."""
    px = px.reshape(h, w * 3)
    lines = bytearray()
    for y in range(h):
        ft = int(filters[y]) if filters is not None else y % 5
        prev = px[y - 1] if y else np.zeros(w * 3, np.uint8)
        lines.append(ft)
        lines += _png_filter_row(px[y], prev, ft, 3).tobytes()
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
            + _png_chunk(b"IEND", b""))


def _png_encode_ex(w: int, h: int, samples, ctype: int, depth: int,
                   interlace: int = 0, palette=None,
                   filter_seed: int = 0) -> bytes:
    """General REAL PNG encoder for every shape the decoder supports:
    ``samples`` is an integer array (h, w, channels-per-ctype) with
    values < 2^depth (for palette ctype 3 the samples are indices and
    ``palette`` the (n, 3) table). Packs sub-byte samples MSB-first
    with row padding, 16-bit big-endian, cycles all five filters, and
    for ``interlace=1`` splits into the 7 Adam7 passes (each filtered
    as its own sub-image, per the spec)."""
    ch = _PNG_CHANNELS[ctype]
    samples = np.asarray(samples, dtype=np.int64).reshape(h, w, ch)
    bits_pp = depth * ch
    fbpp = max(1, bits_pp // 8)

    def pack(sub: "np.ndarray") -> "np.ndarray":
        ph, pw = sub.shape[:2]
        if depth == 16:
            by = np.zeros((ph, pw, ch, 2), np.uint8)
            by[..., 0] = (sub >> 8) & 0xFF
            by[..., 1] = sub & 0xFF
            return by.reshape(ph, pw * ch * 2)
        if depth == 8:
            return sub.astype(np.uint8).reshape(ph, pw * ch)
        per_byte = 8 // depth
        pad = (-pw) % per_byte
        flat = np.concatenate([sub.reshape(ph, pw),
                               np.zeros((ph, pad), np.int64)], axis=1)
        shifts = np.arange(per_byte - 1, -1, -1) * depth
        return (flat.reshape(ph, -1, per_byte)
                << shifts).sum(axis=2).astype(np.uint8)

    def filt(rows: "np.ndarray", seed: int) -> bytes:
        out = bytearray()
        prev = np.zeros(rows.shape[1], np.uint8)
        for y in range(rows.shape[0]):
            ft = (y + seed) % 5
            out.append(ft)
            out += _png_filter_row(rows[y], prev, ft, fbpp).tobytes()
            prev = rows[y]
        return bytes(out)

    if interlace == 0:
        raw = filt(pack(samples), filter_seed)
    else:
        raw = b""
        for pi, (x0, y0, dx, dy) in enumerate(_ADAM7):
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            raw += filt(pack(sub), filter_seed + pi)
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([depth, ctype, 0, 0, interlace]))
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if ctype == 3:
        out += _png_chunk(b"PLTE",
                          np.asarray(palette, np.uint8).tobytes())
    return (out + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def synth_png_blob(df: DataFrame, id_col: str = "doc_id",
                   blob_col: str = "blob") -> DataFrame:
    """Deterministic REAL-PNG source: same closed-form pixel arithmetic
    as ``synth_ppm_blob`` (``w=(id%13)+4, h=(id%11)+4``, pixel byte
    ``i = (id*7 + 31i) % 256``) but stored as a genuine zlib-compressed
    PNG whose scanline filter type cycles ``(y + id) % 5`` — so reading
    the pixels back requires a decoder that implements chunk CRCs,
    inflate, and ALL five unfilter paths. An external oracle replays
    the arithmetic without any image code; filter choice never changes
    the decoded pixels, so the oracle certifies the full decode."""
    key = df.schema[id_col]
    schema = StructType([key, StructField(blob_col, BinaryType(), False)])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = i % 13 + 4, i % 11 + 4
                n = w * h * 3
                px = ((i * 7 + 31 * np.arange(n, dtype=np.int64)) % 256
                      ).astype(np.uint8)
                filters = [(y + i) % 5 for y in range(h)]
                blobs.append(_png_encode(w, h, px, filters))
            yield pd.DataFrame({id_col: pdf[id_col], blob_col: blobs})

    return df.select(id_col).mapInPandas(fn, schema)


def _synth_png_variant_bytes(i: int) -> bytes:
    """One deterministic PNG whose DECODED pixels equal the plain
    synth arithmetic (``w=(i%13)+4, h=(i%11)+4``, byte
    ``(i*7 + 31k) % 256``) but whose ENCODING cycles the decoder's
    hard paths by ``i % 4``: RGBA (alpha stripped), 16-bit RGB (both
    bytes carry the value, so the high byte IS the pixel), palette
    (the <=224 distinct colors of one image always fit a PLTE), and
    Adam7-interlaced RGB. Decoded pixels are identical across
    variants, so the plain-PNG SQL oracle certifies all four."""
    w, h = i % 13 + 4, i % 11 + 4
    n = w * h * 3
    px = ((i * 7 + 31 * np.arange(n, dtype=np.int64)) % 256
          ).astype(np.uint8).reshape(h, w, 3)
    v = i % 4
    if v == 0:                                  # RGBA, alpha=255
        rgba = np.concatenate(
            [px, np.full((h, w, 1), 255, np.uint8)], axis=2)
        return _png_encode_ex(w, h, rgba, ctype=6, depth=8,
                              filter_seed=i)
    if v == 1:                                  # 16-bit RGB, hi==lo==v
        return _png_encode_ex(w, h, px.astype(np.int64) * 257,
                              ctype=2, depth=16, filter_seed=i)
    if v == 2:                                  # palette
        colors, idx = np.unique(px.reshape(-1, 3), axis=0,
                                return_inverse=True)
        return _png_encode_ex(w, h, idx.reshape(h, w, 1), ctype=3,
                              depth=8, palette=colors, filter_seed=i)
    return _png_encode_ex(w, h, px, ctype=2, depth=8, interlace=1,
                          filter_seed=i)


def synth_png_blob_variants(df: DataFrame, id_col: str = "doc_id",
                            blob_col: str = "blob") -> DataFrame:
    """Deterministic REAL-PNG source over the decoder's full shape
    surface (see ``_synth_png_variant_bytes``)."""
    key = df.schema[id_col]
    schema = StructType([key, StructField(blob_col, BinaryType(), False)])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [_synth_png_variant_bytes(int(i)) for i in pdf[id_col]]
            yield pd.DataFrame({id_col: pdf[id_col], blob_col: blobs})

    return df.select(id_col).mapInPandas(fn, schema)


def decode_image_features(df: DataFrame, blob_col: str = "blob",
                          n_features: int = 8, fake: bool = False,
                          key_cols=("doc_id",)) -> DataFrame:
    """Decode → feature-extract stage over mapInPandas.

    With fake=False the blob is REALLY decoded via ``_decode_rgb``
    (PPM P6 / BMP-24 — the formats parsable without an image library)
    into ``[width, height, mean_r, mean_g, mean_b]`` zero-padded to
    ``n_features``; formats that need PIL/libvips raise the decoder's
    clearly-marked NotImplementedError. With fake=True a deterministic
    sha256-derived vector stands in (any bytes accepted) so the batch
    shape, schema and partitioning are exercised format-free.
    """
    key_cols = list(key_cols)
    schema = StructType(
        [df.schema[k] for k in key_cols]
        + [StructField("features", ArrayType(FloatType()), True)])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf[blob_col]:
                if blob is None:
                    feats.append(None)
                    continue
                if fake:
                    digest = hashlib.sha256(bytes(blob)).digest()
                    v = np.frombuffer(digest[:4 * n_features],
                                      dtype=np.uint32)
                    feats.append((v.astype(np.float32)
                                  / np.float32(2**32)).tolist())
                    continue
                w, h, px = _decode_rgb(bytes(blob))
                means = px.reshape(-1, 3).mean(axis=0)
                vec = [np.float32(w), np.float32(h),
                       *(np.float32(m) for m in means)]
                vec += [np.float32(0.0)] * (n_features - len(vec))
                feats.append([float(x) for x in vec[:n_features]])
            out = pdf[key_cols].copy()
            out["features"] = feats
            yield out

    return df.select(*key_cols, blob_col).mapInPandas(fn, schema)


def frame_sample_stub(df: DataFrame, blob_col: str = "blob",
                      every_ms: int = 1000, key_cols=("doc_id",)) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    (frame_idx, ts_ms, frame_blob). Decode stubbed: frame_blob is a
    deterministic slice of the source bytes. SUPERSEDED for real
    containers by ``frame_sample_real`` (Y4M parse, vectorized stride
    decode) — kept for arbitrary-blob plumbing tests and the
    byte-arithmetic oracle."""
    key_cols = list(key_cols)
    schema = StructType(
        [df.schema[k] for k in key_cols] + [
            StructField("frame_idx", IntegerType(), False),
            StructField("ts_ms", IntegerType(), False),
            StructField("frame_blob", BinaryType(), True),
        ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = {k: [] for k in key_cols}
            fidx, ts, blobs = [], [], []
            for row in pdf[key_cols + [blob_col]].itertuples(index=False):
                blob = row[-1]
                if blob is None:
                    continue
                b = bytes(blob)
                n_frames = max(1, min(4, len(b) // 64))
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    for k, v in zip(key_cols, row[:-1]):
                        keys[k].append(v)
                    fidx.append(i)
                    ts.append(i * every_ms)
                    blobs.append(b[i * step:(i + 1) * step])
            yield pd.DataFrame({**keys, "frame_idx": fidx, "ts_ms": ts,
                                "frame_blob": blobs})

    return df.select(*key_cols, blob_col).mapInPandas(fn, schema)


def _parse_wav(b: bytes):
    """Real RIFF/WAVE parse: verify the container, walk chunks (with
    odd-size padding) to `fmt ` and `data`, return (channels, rate,
    int16 sample array). Raises ValueError on malformed input —
    callers decide whether to null or fail."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        sz = int.from_bytes(b[pos + 4:pos + 8], "little")
        body = b[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)          # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or bits != 16 or channels < 1:
        raise ValueError("only 16-bit PCM supported")
    samples = np.frombuffer(data[:len(data) & ~1], dtype="<i2")
    return channels, rate, samples


def afp_bits(ch: int, samples: "np.ndarray", slots: int = 64) -> int:
    """Integer-exact temporal-energy audio fingerprint of one decoded
    PCM clip: mono frame energy m[t] = (sum over channels of
    |sample|) // ch; frames binned into ``slots`` time slots by
    floor(t*slots/T) (empty slots read 0 for clips shorter than the
    grid); slot value = floor-mean of m over the slot; global mean =
    floor-mean of the slots; bit = slot > mean, packed from bit 63
    down, returned as two's-complement int64. The 1-D twin of
    ``ahash_bits`` — a coarse loudness-envelope signature that is
    sample-rate- and amplitude-scale-coarse, replayable bit-for-bit
    by any engine because every step is integer arithmetic."""
    m = _mono_envelope(ch, samples)
    t = len(m)
    if t == 0:
        return 0
    slot_id = (np.arange(t, dtype=np.int64) * slots) // t
    # int64 scatter-add, NOT bincount(weights=...) — same exactness
    # rationale as ahash_bits
    sums = np.zeros(slots, dtype=np.int64)
    np.add.at(sums, slot_id, m.astype(np.int64, copy=False))
    counts = np.bincount(slot_id, minlength=slots)
    cells = np.where(counts > 0, sums // np.maximum(counts, 1), 0)
    return _pack_bits(cells)


def audio_fingerprint(df: DataFrame, blob_col: str = "blob",
                      key_cols=("doc_id",)) -> DataFrame:
    """64-bit audio near-duplicate signature per clip: real WAV parse
    (``_parse_wav``) then the temporal-energy ``afp_bits`` recipe.
    Feed the result to ``dedup.hamming_candidates`` — the same capped
    pigeonhole kernel text SimHash and image aHash use, so all three
    modalities share one scale-safe near-dup path.

    Scale shape: mapInPandas over (keys, blob) only; audio bytes
    never outlive the decode stage, downstream joins shuffle 8-byte
    signatures. Malformed/null blobs yield null fingerprints
    (quarantine-not-crash)."""
    key_cols = list(key_cols)
    schema = StructType(
        [df.schema[k] for k in key_cols] + [
            StructField("afp", LongType(), True),
        ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({k: pdf[k] for k in key_cols})
            vals = []
            for blob in pdf[blob_col]:
                try:
                    if blob is None:
                        raise ValueError("null blob")
                    ch, _rate, s = _parse_wav(bytes(blob))
                    vals.append(afp_bits(ch, s))
                except ValueError:
                    vals.append(None)
            out["afp"] = pd.Series(vals, dtype="object")
            yield out

    return df.select(*key_cols, blob_col).mapInPandas(fn, schema)


def synth_wav_blob(df: DataFrame, id_col: str = "doc_id",
                   blob_col: str = "blob",
                   seed_col: Optional[str] = None) -> DataFrame:
    """Deterministic audio source: a REAL 16-bit PCM RIFF/WAVE blob
    per row — channels = s%2+1, 8 kHz, frames = s%50+20, sample
    i = ((s*13 + i*37) % 65536) - 32768 — a closed arithmetic form
    an external oracle replays without any audio code, while the
    decode stage exercises actual container parsing (chunk walk,
    fmt fields, little-endian PCM). ``s`` is ``seed_col`` when given
    (plants a small set of clip CLASSES while keeping real row ids)
    else ``id_col``."""
    key = df.schema[id_col]
    schema = StructType([key, StructField(blob_col, BinaryType(), False)])
    seed = seed_col or id_col
    cols = [id_col] if seed == id_col else [id_col, seed]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for i in pdf[seed]:
                i = int(i)
                ch, rate, frames = i % 2 + 1, 8000, i % 50 + 20
                n = frames * ch
                s = ((i * 13 + 37 * np.arange(n, dtype=np.int64))
                     % 65536 - 32768).astype("<i2")
                data = s.tobytes()
                fmt = (b"\x01\x00" + ch.to_bytes(2, "little")
                       + rate.to_bytes(4, "little")
                       + (rate * ch * 2).to_bytes(4, "little")
                       + (ch * 2).to_bytes(2, "little")
                       + (16).to_bytes(2, "little"))
                body = (b"WAVEfmt " + len(fmt).to_bytes(4, "little")
                        + fmt + b"data"
                        + len(data).to_bytes(4, "little") + data)
                blobs.append(b"RIFF" + len(body).to_bytes(4, "little")
                             + body)
            yield pd.DataFrame({id_col: pdf[id_col], blob_col: blobs})

    return df.select(*cols).mapInPandas(fn, schema)


def decode_audio_features(df: DataFrame, blob_col: str = "blob",
                          key_cols=("doc_id",)) -> DataFrame:
    """Real audio decode: parse each WAV blob (``_parse_wav``) and
    emit integer-exact witnesses — channels, sample rate, frame
    count, sum of absolute sample values, max absolute sample.

    Same scale shape as the image decode: mapInPandas over
    (keys, blob) only, numpy per-blob arithmetic, tiny integer output
    rows — downstream shuffles metadata, never audio bytes.
    Malformed blobs yield null features instead of failing the job
    (the production quarantine-not-crash policy)."""
    key_cols = list(key_cols)
    schema = StructType(
        [df.schema[k] for k in key_cols] + [
            StructField("n_channels", IntegerType(), True),
            StructField("sample_rate", IntegerType(), True),
            StructField("n_frames", LongType(), True),
            StructField("sum_abs", LongType(), True),
            StructField("max_abs", LongType(), True),
        ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict = {k: pdf[k] for k in key_cols}
            ch_, rt_, fr_, sa_, ma_ = [], [], [], [], []
            for blob in pdf[blob_col]:
                try:
                    if blob is None:
                        raise ValueError("null blob")
                    ch, rate, s = _parse_wav(bytes(blob))
                    a = np.abs(s.astype(np.int64))
                    ch_.append(ch); rt_.append(rate)
                    fr_.append(len(s) // ch)
                    sa_.append(int(a.sum()))
                    ma_.append(int(a.max()) if len(a) else 0)
                except ValueError:
                    ch_.append(None); rt_.append(None)
                    fr_.append(None); sa_.append(None); ma_.append(None)
            out = pd.DataFrame(cols)
            out["n_channels"], out["sample_rate"] = ch_, rt_
            out["n_frames"], out["sum_abs"], out["max_abs"] = fr_, sa_, ma_
            yield out

    return df.select(*key_cols, blob_col).mapInPandas(fn, schema)


def synth_y4m_blob(df: DataFrame, id_col: str = "doc_id",
                   blob_col: str = "blob",
                   seed_col: Optional[str] = None) -> DataFrame:
    """Deterministic video source: a REAL YUV4MPEG2 (Y4M) stream per
    row — plain-text header, C420 planar frames behind ``FRAME``
    markers. Dims W=(s%8+2)*2, H=(s%6+2)*2, n_frames=s%7+3; byte j
    of frame f is (s*11 + f*101 + j*7) % 256 — a closed form an
    external oracle replays with no video code, while the decode
    stage parses the actual container. ``s`` is ``seed_col`` when
    given (plants a small set of clip CLASSES while keeping real
    row ids) else ``id_col``."""
    key = df.schema[id_col]
    schema = StructType([key, StructField(blob_col, BinaryType(), False)])
    seed = seed_col or id_col
    cols = [id_col] if seed == id_col else [id_col, seed]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for i in pdf[seed]:
                i = int(i)
                w, h, nf = (i % 8 + 2) * 2, (i % 6 + 2) * 2, i % 7 + 3
                fsz = w * h * 3 // 2                    # C420 planar
                head = (f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n"
                        .encode("ascii"))
                parts = [head]
                j = np.arange(fsz, dtype=np.int64)
                for f in range(nf):
                    px = (i * 11 + f * 101 + j * 7) % 256
                    parts.append(b"FRAME\n"
                                 + px.astype(np.uint8).tobytes())
                blobs.append(b"".join(parts))
            yield pd.DataFrame({id_col: pdf[id_col], blob_col: blobs})

    return df.select(*cols).mapInPandas(fn, schema)


def _parse_y4m_y(b: bytes) -> tuple[int, int, int, "np.ndarray"]:
    """Real YUV4MPEG2 parse shared by ``frame_sample_real`` and
    ``scene_cuts``: validate the header (W/H/C420 tokens), reshape
    the body as a UNIFORM STRIDE buffer (one numpy view, no per-frame
    Python loop), validate every FRAME marker vectorized, and return
    (w, h, n_frames, uint8 Y-planes of shape (n_frames, w*h)).
    Raises ValueError on malformed input — callers quarantine."""
    nl = b.index(b"\n")
    toks = b[:nl].split(b" ")
    if toks[0] != b"YUV4MPEG2":
        raise ValueError("not Y4M")
    w = h = None
    c420 = True
    for t in toks[1:]:
        if t[:1] == b"W":
            w = int(t[1:])
        elif t[:1] == b"H":
            h = int(t[1:])
        elif t[:1] == b"C":
            c420 = t[1:].startswith(b"420")
    # positive-dimension check, not truthiness: a malformed 'W-1'
    # header is truthy but gives stride 0 (ZeroDivisionError below)
    if w is None or h is None or w <= 0 or h <= 0 or not c420:
        raise ValueError("unsupported Y4M layout")
    fsz = w * h * 3 // 2
    stride = 6 + fsz
    body = b[nl + 1:]
    nf = len(body) // stride
    if nf == 0 or len(body) % stride:
        raise ValueError("truncated frame array")
    arr = np.frombuffer(body, dtype=np.uint8, count=nf * stride)
    arr = arr.reshape(nf, stride)
    if not (arr[:, :6] == np.frombuffer(b"FRAME\n", np.uint8)).all():
        raise ValueError("bad FRAME marker")
    return w, h, nf, arr[:, 6:6 + w * h]


def frame_sample_real(df: DataFrame, blob_col: str = "blob",
                      every: int = 2,
                      key_cols=("doc_id",)) -> DataFrame:
    """REAL video frame sampling: parse the Y4M header (W/H/C420
    tokens), then treat the frame array as a UNIFORM STRIDE buffer —
    one reshape to (n_frames, 6 + frame_size), marker validation and
    Y-plane sums fully vectorized in numpy. No per-frame Python loop
    (the round-2 stub's itertuples hazard, fixed for the real path).
    Emits every ``every``-th frame's (frame_idx, sum_y, max_y) —
    integer-exact, arithmetic-oracled. Malformed blobs yield no rows
    (quarantine-not-crash); at scale the explode-shaped output keeps
    rows tiny while blobs never leave the decode stage."""
    key_cols = list(key_cols)
    schema = StructType(
        [df.schema[k] for k in key_cols] + [
            StructField("frame_idx", LongType(), True),
            StructField("sum_y", LongType(), True),
            StructField("max_y", LongType(), True),
        ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_keys: dict = {k: [] for k in key_cols}
            fi_, sy_, my_ = [], [], []
            for ridx, blob in enumerate(pdf[blob_col]):
                try:
                    w, h, nf, planes = _parse_y4m_y(bytes(blob))
                    # stay uint8; int64 only in the sum ACCUMULATOR
                    # (an .astype(int64) would hold 8x the clip at
                    # once inside the task)
                    y = planes[::every]
                    idxs = np.arange(nf)[::every]
                    for k in key_cols:
                        out_keys[k].extend([pdf[k].iloc[ridx]] * len(idxs))
                    fi_.extend(int(x) for x in idxs)
                    sy_.extend(int(s) for s in y.sum(axis=1,
                                                     dtype=np.int64))
                    my_.extend(int(m) for m in y.max(axis=1))
                except (ValueError, IndexError):
                    continue
            out = pd.DataFrame(out_keys)
            out["frame_idx"], out["sum_y"], out["max_y"] = fi_, sy_, my_
            yield out

    return df.select(*key_cols, blob_col).mapInPandas(fn, schema)


def scene_cuts(df: DataFrame, blob_col: str = "blob",
               threshold_ppm: int = 250_000,
               key_cols=("doc_id",)) -> DataFrame:
    """Shot-boundary (scene-change) detection over real Y4M video: for
    every consecutive frame pair, the mean absolute Y-plane difference
    normalized to parts-per-million of full scale —
    ``diff_ppm = sum|Y_f - Y_{f-1}| * 1_000_000 // (w*h*255)`` — and
    ``is_cut = 1`` when it exceeds ``threshold_ppm``. One output row
    per consecutive pair (frame_idx = the LATER frame), integer-exact
    so an external oracle replays the arithmetic with no video code.
    This is the classic pixel-difference shot detector — the curation
    step that segments raw video into shots before frame sampling.

    Scale shape: mapInPandas over (keys, blob) only — the frame-diff
    is vectorized numpy inside the decode stage, blobs never outlive
    it, and the output rows are 4 small integers per frame pair.
    Malformed blobs yield no rows (quarantine-not-crash)."""
    key_cols = list(key_cols)
    schema = StructType(
        [df.schema[k] for k in key_cols] + [
            StructField("frame_idx", LongType(), True),
            StructField("diff_sum", LongType(), True),
            StructField("diff_ppm", LongType(), True),
            StructField("is_cut", LongType(), True),
        ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_keys: dict = {k: [] for k in key_cols}
            fi_, ds_, dp_, ic_ = [], [], [], []
            for ridx, blob in enumerate(pdf[blob_col]):
                try:
                    if blob is None:
                        raise ValueError("null blob")
                    w, h, nf, planes = _parse_y4m_y(bytes(blob))
                    if nf < 2:
                        continue
                    # diff of uint8 values fits int16; int64 only in
                    # the sum accumulator — peak memory 1/4 of an
                    # int64 upcast of the whole clip, same integers
                    y = planes.astype(np.int16)
                    diffs = np.abs(y[1:] - y[:-1]) \
                        .sum(axis=1, dtype=np.int64)
                    ppm = diffs * 1_000_000 // (w * h * 255)
                    for k in key_cols:
                        out_keys[k].extend([pdf[k].iloc[ridx]] * (nf - 1))
                    fi_.extend(range(1, nf))
                    ds_.extend(int(x) for x in diffs)
                    dp_.extend(int(x) for x in ppm)
                    ic_.extend(int(x > threshold_ppm) for x in ppm)
                except (ValueError, IndexError):
                    continue
            out = pd.DataFrame(out_keys)
            out["frame_idx"] = fi_
            out["diff_sum"], out["diff_ppm"], out["is_cut"] = ds_, dp_, ic_
            yield out

    return df.select(*key_cols, blob_col).mapInPandas(fn, schema)


def audio_energy_windows(df: DataFrame, blob_col: str = "blob",
                         window: int = 16,
                         silence_threshold: int = 8192,
                         key_cols=("doc_id",)) -> DataFrame:
    """Voice-activity-style audio segmentation over real WAV PCM: the
    clip's mono energy envelope m[t] = (sum over channels |sample|)
    // ch (the same mono reduction as ``afp_bits``) is cut into
    fixed ``window``-frame windows (trailing partial window dropped);
    each emits (win_idx, energy = floor-mean of m, is_silent =
    energy < silence_threshold). The silence mask is the curation
    primitive for trimming dead air / splitting clips before
    training. Integer-exact, so an external oracle replays it.

    Scale shape: mapInPandas over (keys, blob) only; audio bytes
    never outlive the stage, output rows are 3 small integers per
    window. Malformed blobs yield no rows (quarantine-not-crash)."""
    key_cols = list(key_cols)
    schema = StructType(
        [df.schema[k] for k in key_cols] + [
            StructField("win_idx", LongType(), True),
            StructField("energy", LongType(), True),
            StructField("is_silent", LongType(), True),
        ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_keys: dict = {k: [] for k in key_cols}
            wi_, en_, si_ = [], [], []
            for ridx, blob in enumerate(pdf[blob_col]):
                try:
                    if blob is None:
                        raise ValueError("null blob")
                    ch, _rate, s = _parse_wav(bytes(blob))
                    m = _mono_envelope(ch, s)
                    nw = len(m) // window
                    if nw == 0:
                        continue
                    e = m[:nw * window].reshape(nw, window) \
                        .sum(axis=1) // window
                    for k in key_cols:
                        out_keys[k].extend([pdf[k].iloc[ridx]] * nw)
                    wi_.extend(range(nw))
                    en_.extend(int(x) for x in e)
                    si_.extend(int(x < silence_threshold) for x in e)
                except (ValueError, IndexError):
                    continue
            out = pd.DataFrame(out_keys)
            out["win_idx"], out["energy"], out["is_silent"] = wi_, en_, si_
            yield out

    return df.select(*key_cols, blob_col).mapInPandas(fn, schema)


def shot_keyframes(cuts: DataFrame,
                   key_cols=("doc_id",),
                   clips: DataFrame | None = None) -> DataFrame:
    """Keyframe selection on top of ``scene_cuts`` output: every shot
    contributes its FIRST frame — frame 0 opens shot 0, and each cut
    frame opens the next shot. Emits (keys, shot_idx, start_frame),
    the "one representative frame per shot" step a video curation
    pipeline runs between segmentation and feature extraction.

    Clip universe: by default the shot-0 rows derive from the clips
    PRESENT IN ``cuts`` — and ``scene_cuts`` emits no rows for a valid
    clip with fewer than 2 frames (a cut needs a frame pair), so such
    clips get no shot-0 row here either. Pass ``clips`` (a frame of
    the key columns, one row per clip — e.g. the decoded-clip frame
    the cuts came from) to guarantee every clip yields its
    (shot 0, frame 0) row regardless of frame count.

    Scale shape: pure JVM expressions over the tiny cuts rows (4
    integers per frame pair — the blobs are already gone); the
    per-clip window is bounded by frames-per-clip, the natural
    parallelism unit."""
    from pyspark.sql import Window
    key_cols = list(key_cols)
    w = Window.partitionBy(*key_cols).orderBy("frame_idx")
    starts = (cuts.filter(F.col("is_cut") == 1)
              .select(*key_cols,
                      F.row_number().over(w).cast("long")
                      .alias("shot_idx"),
                      F.col("frame_idx").alias("start_frame")))
    universe = clips.select(*key_cols) if clips is not None else cuts
    shot0 = (universe.select(*key_cols).distinct()
             .select(*key_cols,
                     F.lit(0).cast("long").alias("shot_idx"),
                     F.lit(0).cast("long").alias("start_frame")))
    return shot0.unionAll(starts)
