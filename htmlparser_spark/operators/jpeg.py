"""Lib-free baseline JPEG: a REAL decoder (stdlib + numpy only) and a
deterministic synth encoder, closing the one decode gap the earlier
rounds honestly stubbed (multimodal.py used to raise
NotImplementedError for JPEG pending PIL/libvips).

Decoder scope — baseline sequential DCT (ITU-T T.81 / ISO 10918-1,
the public JPEG spec), the dominant web shape:

- full marker walk (SOI, APPn, COM, DQT, DHT, DRI, SOF0, SOS, EOI);
- 8-bit quantization tables, canonical Huffman tables rebuilt from
  the DHT (bits, values) exactly as Annex C specifies;
- entropy decode of the interleaved scan: per-component DC
  prediction, EXTEND sign recovery (F.2.2.1), run/size AC decode
  with ZRL and EOB, 0xFF00 byte-unstuffing, RSTn restart handling
  (byte-aligned, DC predictors reset);
- dequantize -> separable float64 IDCT (A.3.3) -> level shift,
  YCbCr->RGB (JFIF conversion) or grayscale replication, sampling
  factors 1 or 2 per axis (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 — the
  dominant web shapes) with pixel-replication chroma upsampling,
  MCU-padding crop for non-multiple dimensions.

Progressive (SOF2) is decoded too (round 5): multi-scan spectral
selection + successive approximation per Annex G — DC first/refine,
AC first with EOBn end-of-band runs, AC refinement with correction
bits — accumulated into per-component coefficient grids and
reconstructed at EOI. ``encode_progressive_jpeg`` writes the same
quantized coefficients as a real SOF2 file (libjpeg-shaped default
scan script) so the fuzz differential and the driver oracle certify
the path end to end.

Honest refusals (NotImplementedError): lossless/hierarchical frame
types, arithmetic coding, 12-bit precision, and sampling factors
above 2 — an image library's job.
Malformed bytes raise ValueError so the mapInPandas quarantine path
in multimodal.py stays total.

Synth encoder — the oracle trick (same pattern as synth_png_blob):
a general baseline encoder would make decoded pixels a lossy
function no SQL oracle could replay, so ``synth_jpeg_blob`` builds
each image directly in the QUANTIZED COEFFICIENT domain from two
exactly-representable bases:

- a flat DC block of value ``v = 128 + 2k``: with the Annex K
  luminance table's DC step 16, the quantized DC is ``(v-128)/2``
  exactly, and the IDCT returns ``v`` exactly;
- one AC coefficient at (u,v)=(4,4), whose 2-D basis is
  ``s_x * s_y / 2`` with ``s in {-1,+1}`` (the only AC basis with
  rational values), scaled so its pixel contribution is the integer
  ``17 * e * s_x * s_y`` for ``e in {-1,0,1}``.

Pixels are gray (R=G=B), chroma blocks are all-zero, so the JFIF
color transform is exact, and every decoded pixel is a closed-form
integer in (doc_id, block_index, x, y). The witnesses a driver
oracle replays (``jpeg_decode_stats``):

- per-channel pixel sum: the AC basis sums to zero over a block, so
  sum = sigma_blocks 64*v_b — certifies header/DC/dequant/IDCT;
- the sign-weighted sum sigma px(x,y)*s_x*s_y: the DC part cancels
  and each block contributes 1088*e_b — certifies the AC run/size
  Huffman path (a decoder that drops or misplaces AC coefficients
  passes the plain sum but not this).

The entropy layer is additionally fuzz-pinned (test_jpeg.py) by
encoding random quantized coefficient blocks — all sizes, runs, ZRL,
EOB, restart markers, stuffed bytes — and comparing the decode
against an independent per-definition IDCT.

Scale shape: same as every media op here — decode runs inside
mapInPandas on (keys, blob) only, per-image work is numpy, output
rows are a handful of ints, so blobs never outlive the decode stage
and never shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StructField, StructType,
)

__all__ = ["synth_jpeg_blob", "jpeg_decode_stats", "decode_jpeg",
           "encode_baseline_jpeg", "encode_progressive_jpeg"]

# ---------------------------------------------------------------------------
# public spec tables (ITU-T T.81)
# ---------------------------------------------------------------------------

# zigzag index -> natural (row*8+col) index (Figure 5 / A.3.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1/K.2 example quantization tables (natural order)
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 typical Huffman tables as (bits[1..16], values).  The
# decoder never assumes these — it rebuilds whatever the file's DHT
# carries — so round-trip correctness does not depend on them; they
# are simply the public-spec choice the synth encoder writes.
HUFF_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa])
HUFF_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa])

# separable IDCT basis (A.3.3): B[u, x] = C(u)/2 * cos((2x+1) u pi/16)
_IDCT_B = np.empty((8, 8))
for _u in range(8):
    _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _IDCT_B[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16)
del _u, _cu, _x


def _idct2(coeffs: "np.ndarray") -> "np.ndarray":
    """2-D 8x8 IDCT of dequantized coefficients (float64, unshifted)."""
    return _IDCT_B.T @ coeffs @ _IDCT_B


# ---------------------------------------------------------------------------
# canonical Huffman (Annex C)
# ---------------------------------------------------------------------------

def _canonical_codes(bits, values):
    """(bits[16], values) -> {value: (code_int, code_len)} per Annex C
    code assignment: codes of each length are consecutive, shorter
    lengths first."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    if len(codes) != len(values):
        raise ValueError("DHT bits/values length mismatch")
    return codes


class _HuffDecoder:
    """Canonical Huffman decode table: mincode/maxcode/valptr per code
    length (the T.81 F.2.2.3 DECODE procedure)."""

    def __init__(self, bits, values):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.values = list(values)
        code, k = 0, 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bit()
            if self.maxcode[length] >= code >= self.mincode[length]:
                return self.values[self.valptr[length]
                                   + code - self.mincode[length]]
        raise ValueError("invalid Huffman code in entropy stream")


# ---------------------------------------------------------------------------
# bit IO over the entropy-coded segment
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:          # byte stuffing (B.1.1.5)
                    self.out.append(0x00)
                self.acc, self.nbits = 0, 0

    def align_ones(self) -> None:
        """Pad to a byte boundary with 1-bits (B.2.1 before markers)."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


class _BitReader:
    """Reads entropy-coded bits, unstuffing FF00 and stopping cleanly
    at any real marker (left for the caller to consume)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if not self.nbits:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(
                    self.data) else None
                if nxt == 0x00:
                    self.pos += 2                  # stuffed FF
                else:
                    raise ValueError("JPEG entropy stream hit marker "
                                     "mid-symbol")
            else:
                self.pos += 1
            self.acc, self.nbits = byte, 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.nbits = 0

    def at_marker(self):
        """(marker_byte, next_pos) if the aligned stream sits at a
        marker, else None. Skips stuffed FF00 pairs first: the 1-bit
        padding before a restart marker can itself complete a 0xFF
        byte, which the encoder stuffs like any other entropy byte."""
        p = self.pos
        while p + 1 < len(self.data) and self.data[p] == 0xFF \
                and self.data[p + 1] == 0x00:
            p += 2
        if p + 1 < len(self.data) and self.data[p] == 0xFF \
                and self.data[p + 1] != 0x00:
            return self.data[p + 1], p + 2
        return None


def _extend(v: int, size: int) -> int:
    """F.2.2.1 EXTEND: map the `size`-bit magnitude to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _bit_size(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder (synth source; coefficient-domain)
# ---------------------------------------------------------------------------

def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
        + payload


def _dht_payload(tc_th: int, bits, values) -> bytes:
    return bytes([tc_th]) + bytes(bits) + bytes(values)


def _encode_block(w: _BitWriter, qcoef: "np.ndarray", pred: int,
                  dc_codes, ac_codes) -> int:
    """Entropy-encode one block of QUANTIZED coefficients (natural
    order) per F.1.2; returns the new DC predictor."""
    zz = qcoef[ZIGZAG]
    diff = int(zz[0]) - pred
    size = _bit_size(diff)
    code, ln = dc_codes[size]
    w.write(code, ln)
    if size:
        w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]          # ZRL
            w.write(code, ln)
            run -= 16
        size = _bit_size(v)
        if size > 10:
            raise ValueError(f"AC coefficient {v} exceeds baseline "
                             "size-10 encoding range")
        code, ln = ac_codes[(run << 4) | size]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, ln = ac_codes[0x00]              # EOB
        w.write(code, ln)
    return int(zz[0])


def encode_baseline_jpeg(width: int, height: int, qy, qcb=None, qcr=None,
                         restart_interval: int = 0,
                         sampling=None) -> bytes:
    """Assemble a real baseline JFIF file from per-block QUANTIZED
    coefficient arrays (lists of 64-long natural-order int arrays).

    ``qcb``/``qcr`` None -> single-component grayscale scan; else an
    interleaved 3-component scan. ``sampling`` is one (h, v) pair per
    component (default all (1, 1) = 4:4:4); for 4:2:0 pass
    ``((2, 2), (1, 1), (1, 1))``. Component ``i`` must supply
    ``n_mcu * h_i * v_i`` blocks, MCU-major then within-MCU raster —
    exactly the interleaving order of T.81 A.2.3. ``restart_interval``
    > 0 writes DRI and RSTn markers every that-many MCUs (predictors
    reset, stream byte-aligned) so the decoder's restart path is
    exercisable. Quantization uses the Annex K example tables; the
    typical Annex K Huffman tables go into DHT (the decoder rebuilds
    from DHT, never assumes them)."""
    gray = qcb is None
    ncomp = 1 if gray else 3
    if sampling is None:
        sampling = ((1, 1),) * ncomp
    if len(sampling) != ncomp:
        raise ValueError("sampling length != component count")
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcols = (width + 8 * hmax - 1) // (8 * hmax)
    mrows = (height + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mcols * mrows
    blocks = [qy] if gray else [qy, qcb, qcr]
    for ci, bl in enumerate(blocks):
        hi, vi = sampling[ci]
        if len(bl) != n_mcu * hi * vi:
            raise ValueError(
                f"component {ci}: {len(bl)} blocks != "
                f"{n_mcu} MCUs x {hi}x{vi}")

    out = bytearray(b"\xff\xd8")                       # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(QT_LUM[ZIGZAG[i]])
                                         for i in range(64)))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(int(QT_CHROMA[ZIGZAG[i]])
                                             for i in range(64)))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") \
        + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = sampling[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)                             # SOF0 baseline
    out += _seg(0xC4, _dht_payload(0x00, *HUFF_DC_LUM))
    out += _seg(0xC4, _dht_payload(0x10, *HUFF_AC_LUM))
    if not gray:
        out += _seg(0xC4, _dht_payload(0x01, *HUFF_DC_CHROMA))
        out += _seg(0xC4, _dht_payload(0x11, *HUFF_AC_CHROMA))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    dc_lum = _canonical_codes(*HUFF_DC_LUM)
    ac_lum = _canonical_codes(*HUFF_AC_LUM)
    dc_ch = _canonical_codes(*HUFF_DC_CHROMA)
    ac_ch = _canonical_codes(*HUFF_AC_CHROMA)
    codes = [(dc_lum, ac_lum)] + [(dc_ch, ac_ch)] * (ncomp - 1)
    w = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            w.align_ones()
            w.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            preds = [0] * ncomp
        for ci in range(ncomp):
            hi, vi = sampling[ci]
            dc_c, ac_c = codes[ci]
            for u in range(hi * vi):
                blk = np.asarray(blocks[ci][m * hi * vi + u],
                                 dtype=np.int64)
                preds[ci] = _encode_block(w, blk, preds[ci], dc_c, ac_c)
    w.align_ones()
    out += w.out
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (synth source + fuzz driver for the Annex G path)
# ---------------------------------------------------------------------------

# AC Huffman table for progressive scans: the Annex K tables carry no
# EOBn symbols for n > 0, so end-of-band runs longer than one block
# would be unencodable with them. One flat canonical table — every
# needed symbol (EOB0..EOB14, ZRL, all (run, size<=10) pairs) at code
# length 9 — keeps the encoder simple; the decoder rebuilds from DHT
# and never assumes a shape.
_PROG_AC_VALUES = ([r << 4 for r in range(15)] + [0xF0] +
                   [(r << 4) | s for r in range(16) for s in range(1, 11)])
_PROG_AC_BITS = [0] * 16
_PROG_AC_BITS[8] = len(_PROG_AC_VALUES)        # all codes 9 bits long


def _default_prog_scans(ncomp):
    """A libjpeg-shaped standard script: interleaved DC first at Al=1,
    spectral AC bands per component, then DC and AC refinements down
    to Al=0 — exercises every Annex G scan kind."""
    if ncomp == 1:
        return [((0,), 0, 0, 0, 1),
                ((0,), 1, 5, 0, 2), ((0,), 6, 63, 0, 2),
                ((0,), 0, 0, 1, 0),
                ((0,), 1, 63, 2, 1), ((0,), 1, 63, 1, 0)]
    return [((0, 1, 2), 0, 0, 0, 1),
            ((0,), 1, 5, 0, 2), ((2,), 1, 63, 0, 1), ((1,), 1, 63, 0, 1),
            ((0,), 6, 63, 0, 2),
            ((0, 1, 2), 0, 0, 1, 0),
            ((0,), 1, 63, 2, 1), ((2,), 1, 63, 1, 0), ((1,), 1, 63, 1, 0),
            ((0,), 1, 63, 1, 0)]


class _ProgACState:
    """Pending end-of-band run + its buffered correction bits
    (G.1.2.2 / G.1.2.3): EOBn symbols fold runs of all-insignificant
    band blocks; refinement bits buffered during a run are emitted
    right after the symbol that ends it."""

    def __init__(self, w: _BitWriter, ac_codes):
        self.w = w
        self.ac = ac_codes
        self.eobrun = 0
        self.bits: list[int] = []

    def flush(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = self.ac[r << 4]
            self.w.write(code, ln)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for bit in self.bits:
            self.w.write(bit, 1)
        self.bits = []

    def end_block(self, extra_bits) -> None:
        self.eobrun += 1
        self.bits.extend(extra_bits)
        if self.eobrun == 0x7FFF:
            self.flush()


def _enc_ac_first(w, st, blk, ss, se, al, ac_codes) -> None:
    """AC first pass for one block (G.1.2.2): point transform is a
    sign-magnitude shift; runs of zeros via ZRL, trailing zeros fold
    into the shared EOB run."""
    vals = [int(np.sign(v)) * (abs(int(v)) >> al) for v in blk[ss:se + 1]]
    if not any(vals):
        st.end_block([])
        return
    st.flush()
    r = 0
    last_nz = max(i for i, v in enumerate(vals) if v)
    for i, v in enumerate(vals[:last_nz + 1]):
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, ln = ac_codes[0xF0]
            w.write(code, ln)
            r -= 16
        size = _bit_size(v)
        if size > 10:
            raise ValueError(f"AC coefficient {v} exceeds size-10 range")
        code, ln = ac_codes[(r << 4) | size]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
        r = 0
    if last_nz < len(vals) - 1:
        st.end_block([])


def _enc_ac_refine(w, st, blk, ss, se, al, ac_codes) -> None:
    """AC refinement pass for one block (G.1.2.3): emit (run, 1) +
    sign for newly-significant coefficients, buffer one correction
    bit per already-significant coefficient, fold trailing history
    into the EOB run. ZRLs are emitted at the position where the
    zero-history run crosses 16 so buffered correction bits land in
    the 16-skip span the decoder traverses for that ZRL."""
    mags = [abs(int(v)) >> al for v in blk[ss:se + 1]]
    eob_idx = max((i for i, t in enumerate(mags) if t == 1), default=-1)
    r = 0
    br: list[int] = []
    for i, t in enumerate(mags):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob_idx:
            st.flush()
            code, ln = ac_codes[0xF0]
            w.write(code, ln)
            r -= 16
            for bit in br:
                w.write(bit, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        st.flush()
        code, ln = ac_codes[(r << 4) | 1]
        w.write(code, ln)
        w.write(1 if blk[ss + i] > 0 else 0, 1)
        for bit in br:
            w.write(bit, 1)
        br = []
        r = 0
    if r or br:
        st.end_block(br)


def encode_progressive_jpeg(width: int, height: int, qy, qcb=None,
                            qcr=None, sampling=None, scans=None,
                            restart_interval: int = 0) -> bytes:
    """Assemble a REAL progressive (SOF2) JFIF file from the same
    per-block QUANTIZED coefficient arrays ``encode_baseline_jpeg``
    takes (MCU-major, within-MCU raster per component), so one input
    can be encoded both ways and the decodes byte-compared. ``scans``
    is a list of (comp_indices, Ss, Se, Ah, Al); the default script
    covers DC first/refine, spectral AC bands, AC refinement, and
    EOBn runs. DC scans are interleaved (or the component grid when
    single-component); AC scans are per-component over the
    NON-PADDED block grid (A.2.2), matching the decoder."""
    gray = qcb is None
    ncomp = 1 if gray else 3
    if sampling is None:
        sampling = ((1, 1),) * ncomp
    if len(sampling) != ncomp:
        raise ValueError("sampling length != component count")
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcols = (width + 8 * hmax - 1) // (8 * hmax)
    mrows = (height + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mcols * mrows
    blocks = [qy] if gray else [qy, qcb, qcr]
    grids = []                                   # zigzag-order block grids
    dims = []                                    # (bh_data, bw_data)
    for ci, bl in enumerate(blocks):
        hi, vi = sampling[ci]
        if len(bl) != n_mcu * hi * vi:
            raise ValueError(f"component {ci}: {len(bl)} blocks != "
                             f"{n_mcu} MCUs x {hi}x{vi}")
        grid = np.zeros((mrows * vi, mcols * hi, 64), dtype=np.int64)
        for m in range(n_mcu):
            mrow, mcol = divmod(m, mcols)
            for yy in range(vi):
                for xx in range(hi):
                    blk = np.asarray(bl[m * hi * vi + yy * hi + xx],
                                     dtype=np.int64)
                    grid[mrow * vi + yy, mcol * hi + xx] = blk[ZIGZAG]
        grids.append(grid)
        cw = (width * hi + hmax - 1) // hmax
        ch = (height * vi + vmax - 1) // vmax
        dims.append(((ch + 7) // 8, (cw + 7) // 8))
    if scans is None:
        scans = _default_prog_scans(ncomp)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(QT_LUM[ZIGZAG[i]])
                                         for i in range(64)))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(int(QT_CHROMA[ZIGZAG[i]])
                                             for i in range(64)))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") \
        + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = sampling[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += _seg(0xC2, sof)                       # SOF2 progressive
    out += _seg(0xC4, _dht_payload(0x00, *HUFF_DC_LUM))
    out += _seg(0xC4, _dht_payload(0x10, _PROG_AC_BITS, _PROG_AC_VALUES))
    if not gray:
        out += _seg(0xC4, _dht_payload(0x01, *HUFF_DC_CHROMA))
        out += _seg(0xC4, _dht_payload(0x11, _PROG_AC_BITS,
                                       _PROG_AC_VALUES))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    dc_codes = [_canonical_codes(*HUFF_DC_LUM)] + \
        [_canonical_codes(*HUFF_DC_CHROMA)] * (ncomp - 1)
    ac_codes = _canonical_codes(_PROG_AC_BITS, _PROG_AC_VALUES)

    for comp_idx, ss, se, ah, al in scans:
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            sos += bytes([ci + 1, ((0 if ci == 0 else 1) << 4)
                          | (0 if ci == 0 else 1)])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        w = _BitWriter()
        st = _ProgACState(w, ac_codes)
        interleaved = len(comp_idx) > 1
        if interleaved or (ss == 0 and ncomp == 1):
            n_units = n_mcu
        else:
            n_units = dims[comp_idx[0]][0] * dims[comp_idx[0]][1]
        preds = [0] * len(comp_idx)
        rst = 0
        for m in range(n_units):
            if restart_interval and m and m % restart_interval == 0:
                st.flush()
                w.align_ones()
                w.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * len(comp_idx)
            unit_blocks = []                     # (si, block) in scan order
            if interleaved:
                mrow, mcol = divmod(m, mcols)
                for si, ci in enumerate(comp_idx):
                    hi, vi = sampling[ci]
                    for yy in range(vi):
                        for xx in range(hi):
                            unit_blocks.append(
                                (si, grids[ci][mrow * vi + yy,
                                               mcol * hi + xx]))
            else:
                ci = comp_idx[0]
                bw = mcols * sampling[ci][0] if ss == 0 and ncomp == 1 \
                    else dims[ci][1]
                unit_blocks.append((0, grids[ci][m // bw, m % bw]))
            for si, blk in unit_blocks:
                if ss == 0:
                    if ah == 0:
                        v = int(blk[0]) >> al
                        diff = v - preds[si]
                        preds[si] = v
                        size = _bit_size(diff)
                        code, ln = dc_codes[comp_idx[si]][size]
                        w.write(code, ln)
                        if size:
                            w.write(diff if diff >= 0
                                    else diff + (1 << size) - 1, size)
                    else:
                        w.write((int(blk[0]) >> al) & 1, 1)
                elif ah == 0:
                    _enc_ac_first(w, st, blk, ss, se, al, ac_codes)
                else:
                    _enc_ac_refine(w, st, blk, ss, se, al, ac_codes)
        st.flush()
        w.align_ones()
        out += w.out
    out += b"\xff\xd9"
    return bytes(out)


# the AC(4,4) basis sign pattern: sign of cos((2x+1) pi/4), x = 0..7
_S44 = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)


def synth_block_params(doc_id: int, bi: int) -> tuple[int, int]:
    """(v, e) for block ``bi`` of image ``doc_id``: flat gray level
    ``v = 128 + 2k`` (k in [-55, 55] keeps v +- 17 inside [1, 255])
    and AC(4,4) sign ``e in {-1, 0, 1}``. Closed form, replayed
    verbatim by the SQL oracle."""
    k = (doc_id * 7 + bi * 13) % 111 - 55
    e = (doc_id + bi) % 3 - 1
    return 128 + 2 * k, e


def synth_jpeg_dims(doc_id: int) -> tuple[int, int]:
    return 8 * (doc_id % 4 + 1), 8 * (doc_id % 3 + 1)


def _synth_block(doc_id: int, bi: int) -> "np.ndarray":
    nat44 = 4 * 8 + 4
    v, e = synth_block_params(doc_id, bi)
    q = np.zeros(64, dtype=np.int64)
    q[0] = (v - 128) // 2
    q[nat44] = 2 * e
    return q


def _synth_jpeg_bytes(doc_id: int, restart_interval: int = 0,
                      progressive: bool = False) -> bytes:
    """One deterministic REAL baseline JPEG: per 8x8 block the
    quantized luminance coefficients are DC=(v-128)/2 (exact: the DC
    quant step is 16 and v-128 is even) and AC(4,4)=2e (dequantized
    136e; pixel contribution 17*e*s_x*s_y, exact); chroma blocks are
    all-zero (gray). Decoded pixels are therefore closed-form
    integers — see the module docstring for the oracle identities.

    Even doc_ids encode 4:4:4; odd doc_ids encode 4:2:0 (the dominant
    web shape: 16x16 MCUs of four Y blocks + one Cb + one Cr, MCU
    padding blocks cropped by the decoder). The luminance pattern is
    placed by its RASTER block index regardless of MCU interleaving,
    and all-zero chroma decodes to exactly 128 at either resolution,
    so both variants decode to IDENTICAL pixels — one SQL oracle
    certifies both subsampling paths. ``progressive=True`` writes the
    SAME quantized coefficients as a multi-scan SOF2 file (default
    Annex G script), so the progressive decode path is certified by
    the SAME closed-form oracle."""
    enc = encode_progressive_jpeg if progressive else encode_baseline_jpeg
    w, h = synth_jpeg_dims(doc_id)
    bw, bh = w // 8, h // 8
    if doc_id % 2 == 0:                                # 4:4:4
        qy = [_synth_block(doc_id, bi) for bi in range(bw * bh)]
        n = bw * bh
        qz = np.zeros(64, dtype=np.int64)
        return enc(w, h, qy, [qz] * n, [qz] * n,
                   restart_interval=restart_interval)
    # 4:2:0: Y blocks in MCU-major, within-MCU raster order; blocks
    # past the image edge are padding (flat 128, cropped on decode)
    mcols, mrows = (bw + 1) // 2, (bh + 1) // 2
    qy = []
    pad = np.zeros(64, dtype=np.int64)
    for m in range(mcols * mrows):
        mrow, mcol = divmod(m, mcols)
        for yy in range(2):
            for xx in range(2):
                by, bx = mrow * 2 + yy, mcol * 2 + xx
                qy.append(_synth_block(doc_id, by * bw + bx)
                          if by < bh and bx < bw else pad)
    qz = [np.zeros(64, dtype=np.int64)] * (mcols * mrows)
    return enc(w, h, qy, qz, qz, restart_interval=restart_interval,
               sampling=((2, 2), (1, 1), (1, 1)))


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(b: bytes) -> tuple[int, int, "np.ndarray"]:
    """REAL baseline JPEG decode; returns (width, height,
    pixels[h, w, 3] uint8). See the module docstring for scope."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    coeffs = None          # progressive: per-component coefficient grids
    while True:
        if pos + 2 > len(b):
            raise ValueError("JPEG truncated before SOS")
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got {b[pos]:#x}")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:
            if coeffs is not None:
                return _reconstruct_progressive(frame, coeffs, qt)
            raise ValueError("JPEG EOI before any scan")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                                    # parameterless
        ln = int.from_bytes(b[pos:pos + 2], "big")
        seg = b[pos + 2:pos + ln]
        if len(seg) != ln - 2:
            raise ValueError("JPEG segment overruns file")
        if marker == 0xDB:                              # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError(
                        "16-bit quantization tables unsupported "
                        "(baseline is 8-bit)")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg[p + 1:p + 65], np.uint8)
                qt[tq] = tbl
                p += 65
        elif marker == 0xC4:                            # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits,
                                                                     vals)
                p += 17 + nv
        elif marker == 0xDD:                            # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker in (0xC0, 0xC1, 0xC2):              # SOF0/1/2
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0xF
                if ncomp == 1:
                    hi = vi = 1      # single-component MCU is 1 block
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factor {hi}x{vi} unsupported "
                        "(1 or 2 per axis: 4:4:4 / 4:2:2 / 4:4:0 / "
                        "4:2:0 / grayscale)")
                comps.append({"id": cid, "tq": tq, "h": hi, "v": vi})
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG "
                                          "unsupported")
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG frame (marker FF{marker:02X}: "
                "lossless/hierarchical/arithmetic) unsupported")
        elif marker == 0xDA:                            # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if not frame["progressive"]:
                if ns != len(frame["comps"]):
                    raise NotImplementedError(
                        "non-interleaved multi-scan sequential JPEG "
                        "unsupported")
                tables = {}
                for si in range(ns):
                    cs, td_ta = seg[1 + 2 * si:3 + 2 * si]
                    tables[cs] = (td_ta >> 4, td_ta & 0xF)
                return _decode_scan(b, pos + ln, frame, tables, qt,
                                    huff_dc, huff_ac, restart_interval)
            # progressive (T.81 Annex G): accumulate coefficient
            # approximations scan by scan, reconstruct at EOI
            ids = [c["id"] for c in frame["comps"]]
            scomps = []
            for si in range(ns):
                cs, td_ta = seg[1 + 2 * si:3 + 2 * si]
                if cs not in ids:
                    raise ValueError("JPEG scan references unknown "
                                     "component")
                scomps.append((ids.index(cs), td_ta >> 4, td_ta & 0xF))
            ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if coeffs is None:
                _block_geometry(frame)
                coeffs = [np.zeros((c["bh_full"], c["bw_full"], 64),
                                   dtype=np.int64)
                          for c in frame["comps"]]
            pos = _decode_progressive_scan(
                b, pos + ln, frame, scomps, ss, se, ah, al,
                huff_dc, huff_ac, restart_interval, coeffs)
            continue
        # APPn / COM / others: skipped
        pos += ln


def _decode_block(reader, dc_dec, ac_dec, pred):
    """Entropy-decode one 8x8 block (F.2.2): returns (zigzag-order
    coefficient vector, new DC predictor)."""
    zz = np.zeros(64, dtype=np.int64)
    size = dc_dec.decode(reader)
    if size > 11:
        raise ValueError("JPEG DC size out of baseline range")
    pred += _extend(reader.receive(size), size)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = ac_dec.decode(reader)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16                       # ZRL
                continue
            break                             # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run overflows block")
        zz[k] = _extend(reader.receive(s), s)
        k += 1
    return zz, pred


def _decode_scan(b, pos, frame, tables, qt, huff_dc, huff_ac,
                 restart_interval):
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcols = (w + 8 * hmax - 1) // (8 * hmax)
    mrows = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mcols * mrows
    reader = _BitReader(b, pos)
    planes = [np.empty((mrows * 8 * c["v"], mcols * 8 * c["h"]),
                       dtype=np.float64) for c in comps]
    preds = [0] * len(comps)
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader.align()
            mk = reader.at_marker()
            if not mk or not (0xD0 <= mk[0] <= 0xD7):
                raise ValueError("JPEG missing expected restart marker")
            if mk[0] - 0xD0 != ((m // restart_interval) - 1) & 7:
                raise ValueError("JPEG restart marker out of sequence")
            reader.pos = mk[1]
            preds = [0] * len(comps)
        mrow, mcol = divmod(m, mcols)
        for ci, comp in enumerate(comps):
            td, ta = tables[comp["id"]]
            if td not in huff_dc or ta not in huff_ac \
                    or comp["tq"] not in qt:
                raise ValueError("JPEG scan references missing table")
            for yy in range(comp["v"]):           # within-MCU raster
                for xx in range(comp["h"]):
                    zz, preds[ci] = _decode_block(
                        reader, huff_dc[td], huff_ac[ta], preds[ci])
                    coef = np.zeros(64, dtype=np.int64)
                    coef[ZIGZAG] = zz
                    deq = (coef * qt[comp["tq"]]).reshape(8, 8) \
                        .astype(np.float64)
                    r0 = (mrow * comp["v"] + yy) * 8
                    c0 = (mcol * comp["h"] + xx) * 8
                    planes[ci][r0:r0 + 8, c0:c0 + 8] = _idct2(deq) + 128.0
    return _planes_to_rgb(frame, planes)


def _planes_to_rgb(frame, planes):
    """Shared reconstruction tail (baseline + progressive): upsample
    subsampled planes by pixel replication, crop MCU padding to
    (h, w), and apply the JFIF color transform."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = [np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                        hmax // c["h"], axis=1)[:h, :w]
              for p, c in zip(planes, comps)]
    if len(comps) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return w, h, np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bch = y + 1.772 * (cb - 128.0)
    px = np.stack([r, g, bch], axis=2)
    return w, h, np.clip(np.round(px), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive decode (ITU-T T.81 Annex G, Huffman successive
# approximation + spectral selection)
# ---------------------------------------------------------------------------

def _block_geometry(frame) -> None:
    """Annotate the frame with MCU and per-component block grids.
    ``bh_full``/``bw_full`` are the MCU-padded grid an interleaved
    scan covers; ``bh_data``/``bw_data`` are the (possibly smaller)
    grid a non-interleaved single-component scan covers (A.2.2:
    ceil of the scaled component dimensions, no MCU padding)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    frame["mcols"] = (w + 8 * hmax - 1) // (8 * hmax)
    frame["mrows"] = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw_full"] = frame["mcols"] * c["h"]
        c["bh_full"] = frame["mrows"] * c["v"]
        c["bw_data"] = ((w * c["h"] + hmax - 1) // hmax + 7) // 8
        c["bh_data"] = ((h * c["v"] + vmax - 1) // vmax + 7) // 8


def _restart(reader, m, ri, unit_name="MCU"):
    """Consume the expected RSTn at an ``m % ri == 0`` boundary."""
    reader.align()
    mk = reader.at_marker()
    if not mk or not (0xD0 <= mk[0] <= 0xD7):
        raise ValueError("JPEG missing expected restart marker")
    if mk[0] - 0xD0 != ((m // ri) - 1) & 7:
        raise ValueError("JPEG restart marker out of sequence")
    reader.pos = mk[1]


def _decode_progressive_scan(b, pos, frame, scomps, ss, se, ah, al,
                             huff_dc, huff_ac, ri, coeffs) -> int:
    """Decode ONE progressive scan into the zigzag-order coefficient
    grids, returning the byte offset of the next marker. Four scan
    kinds (G.2): DC first (Ss=Se=0, Ah=0; point-transformed diffs),
    DC refinement (Ah>0; one appended bit per block), AC first
    (Ss>0, Ah=0; run/size with EOBn end-of-band runs), AC
    refinement (Ss>0, Ah>0; newly-significant ±1<<Al insertions plus
    correction bits for already-nonzero coefficients)."""
    comps = frame["comps"]
    if ss > se or se > 63 or (ss == 0) != (se == 0):
        raise ValueError("JPEG invalid spectral selection")
    if ah not in (0, al + 1):
        raise ValueError("JPEG invalid successive approximation")
    if ss > 0 and len(scomps) != 1:
        raise ValueError("JPEG AC scan must be single-component")
    interleaved = len(scomps) > 1
    reader = _BitReader(b, pos)
    preds = [0] * len(scomps)
    eobrun = 0
    p1 = 1 << al

    def dc_unit(blk, si, td):
        if ah == 0:
            dec = huff_dc.get(td)
            if dec is None:
                raise ValueError("JPEG scan references missing table")
            size = dec.decode(reader)
            if size > 11:
                raise ValueError("JPEG DC size out of range")
            preds[si] += _extend(reader.receive(size), size)
            blk[0] = preds[si] << al
        elif reader.bit():
            blk[0] |= p1

    def ac_refine_tail(blk, k):
        for kk in range(k, se + 1):
            if blk[kk] != 0:
                if reader.bit() and (abs(int(blk[kk])) & p1) == 0:
                    blk[kk] += p1 if blk[kk] > 0 else -p1

    def ac_unit(blk, ta):
        nonlocal eobrun
        if eobrun > 0:
            if ah:
                ac_refine_tail(blk, ss)
            eobrun -= 1
            return
        dec = huff_ac.get(ta)
        if dec is None:
            raise ValueError("JPEG scan references missing table")
        k = ss
        while k <= se:
            rs = dec.decode(reader)
            r, s = rs >> 4, rs & 0xF
            if not ah:                          # first pass (G.2.2)
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.receive(r)
                        return
                    k += 16                     # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("JPEG AC run overflows band")
                blk[k] = _extend(reader.receive(s), s) << al
                k += 1
                continue
            # refinement pass (G.2.3 / decoder mirror of G.1.2.3)
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break                       # tail corrects k..se
                # ZRL: r stays 15 -> 16 zero-history skips below
            elif s == 1:
                newval = p1 if reader.bit() else -p1
            else:
                raise ValueError("JPEG AC refinement size != 1")
            while k <= se:                      # advance r zero-history
                if blk[k] != 0:
                    if reader.bit() and (abs(int(blk[k])) & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("JPEG AC refinement overflows band")
                blk[k] = newval
            k += 1
        if ah and eobrun > 0:
            ac_refine_tail(blk, k)
            eobrun -= 1

    if interleaved or (ss == 0 and len(comps) == 1):
        n_units = frame["mrows"] * frame["mcols"]
    else:
        ci0 = scomps[0][0]
        n_units = comps[ci0]["bh_data"] * comps[ci0]["bw_data"]
    for m in range(n_units):
        if ri and m and m % ri == 0:
            _restart(reader, m, ri)
            preds = [0] * len(scomps)
            eobrun = 0
        if interleaved:                          # DC scan over MCUs
            mrow, mcol = divmod(m, frame["mcols"])
            for si, (ci, td, _ta) in enumerate(scomps):
                c = comps[ci]
                for yy in range(c["v"]):
                    for xx in range(c["h"]):
                        dc_unit(coeffs[ci][mrow * c["v"] + yy,
                                           mcol * c["h"] + xx], si, td)
        else:
            ci, td, ta = scomps[0]
            c = comps[ci]
            bw = c["bw_full"] if ss == 0 and len(comps) == 1 \
                else c["bw_data"]
            blk = coeffs[ci][m // bw, m % bw]
            if ss == 0:
                dc_unit(blk, 0, td)
            else:
                ac_unit(blk, ta)
    # locate the next marker (skipping pad bits / stuffed bytes)
    reader.align()
    p = reader.pos
    while p + 1 < len(b):
        if b[p] == 0xFF and b[p + 1] != 0x00:
            if 0xD0 <= b[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    raise ValueError("JPEG truncated after progressive scan")


def _reconstruct_progressive(frame, coeffs, qt):
    """Dequantize + IDCT every accumulated block and hand the planes
    to the shared reconstruction tail."""
    planes = []
    for ci, c in enumerate(frame["comps"]):
        if c["tq"] not in qt:
            raise ValueError("JPEG frame references missing quant table")
        grid = coeffs[ci]
        bh, bw = grid.shape[:2]
        nat = np.zeros((bh, bw, 64), dtype=np.int64)
        nat[..., ZIGZAG] = grid                  # zigzag -> natural
        deq = (nat * qt[c["tq"]]).astype(np.float64).reshape(bh, bw, 8, 8)
        px = _IDCT_B.T @ deq @ _IDCT_B + 128.0
        planes.append(px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _planes_to_rgb(frame, planes)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def synth_jpeg_blob(df: DataFrame, id_col: str = "doc_id",
                    blob_col: str = "blob",
                    progressive: bool = False) -> DataFrame:
    """Deterministic REAL-JPEG source (the JPEG sibling of
    synth_png_blob): every blob is a genuine JFIF file — markers,
    quant/Huffman tables in DQT/DHT, Huffman-coded scans with byte
    stuffing — built from the closed-form block pattern in
    synth_block_params, so an external SQL oracle can replay the
    decoded pixels without any image code. ``progressive=True``
    writes multi-scan SOF2 files carrying the same coefficients."""
    key = df.schema[id_col]
    schema = StructType([key, StructField(blob_col, BinaryType(), False)])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [_synth_jpeg_bytes(int(i), progressive=progressive)
                     for i in pdf[id_col]]
            yield pd.DataFrame({id_col: pdf[id_col], blob_col: blobs})

    return df.select(id_col).mapInPandas(fn, schema)


def jpeg_decode_stats(df: DataFrame, blob_col: str = "blob",
                      key_cols=("doc_id",)) -> DataFrame:
    """Decode stage with an AC-sensitive witness: width, height,
    per-channel pixel sums (certify header/DC/dequant/IDCT — the
    AC(4,4) basis cancels in a plain sum), plus ``ac_r/g/b`` =
    sigma px(x,y) * s_x * s_y — the sign-weighted sum under which
    the DC part cancels instead, so a decoder that drops, misplaces,
    or mis-signs AC coefficients fails even though the plain sums
    still match. Same scale shape as decode_image_pixels: blobs are
    consumed inside the stage, 8 small ints come out."""
    key_cols = list(key_cols)
    schema = StructType(
        [df.schema[k] for k in key_cols] + [
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("sum_r", LongType(), True),
            StructField("sum_g", LongType(), True),
            StructField("sum_b", LongType(), True),
            StructField("ac_r", LongType(), True),
            StructField("ac_g", LongType(), True),
            StructField("ac_b", LongType(), True),
        ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict = {k: pdf[k] for k in key_cols}
            res: dict = {c: [] for c in
                         ("width", "height", "sum_r", "sum_g", "sum_b",
                          "ac_r", "ac_g", "ac_b")}
            for blob in pdf[blob_col]:
                if blob is None:
                    for c in res:
                        res[c].append(None)
                    continue
                w, h, px = decode_jpeg(bytes(blob))
                sx = np.resize(_S44, w)[None, :, None]
                sy = np.resize(_S44, h)[:, None, None]
                s = (px.astype(np.int64) * sx * sy).sum(axis=(0, 1))
                t = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                res["width"].append(w)
                res["height"].append(h)
                for i, c in enumerate(("sum_r", "sum_g", "sum_b")):
                    res[c].append(int(t[i]))
                for i, c in enumerate(("ac_r", "ac_g", "ac_b")):
                    res[c].append(int(s[i]))
            out = pd.DataFrame(cols)
            for c, v in res.items():
                out[c] = pd.array(v, dtype="Int64" if c.startswith(
                    ("sum", "ac")) else "Int32")
            yield out

    return df.select(*key_cols, blob_col).mapInPandas(fn, schema)
