"""Full-surface PNG decode (W3C PNG / RFC 2083): every color type
(gray, RGB, palette, gray+alpha, RGBA), bit depths 1/2/4/8/16, and
Adam7 interlacing, certified by round-tripping through the general
encoder (an independent packing path) against closed-form expected
pixels."""

import numpy as np
import pytest

from htmlparser_spark.operators.multimodal import (
    _decode_png, _png_encode, _png_encode_ex, _synth_png_variant_bytes)

_COMBOS = [(0, 1), (0, 2), (0, 4), (0, 8), (0, 16), (2, 8), (2, 16),
           (3, 1), (3, 2), (3, 4), (3, 8), (4, 8), (4, 16),
           (6, 8), (6, 16)]


def _expected(samples, ctype, depth, palette):
    if ctype == 3:
        return palette[samples[..., 0]]
    if depth == 16:
        vals = (samples >> 8).astype(np.uint8)
    elif depth < 8:
        vals = ((samples.astype(np.int64) * 255)
                // ((1 << depth) - 1)).astype(np.uint8)
    else:
        vals = samples.astype(np.uint8)
    if ctype in (0, 4):
        return np.repeat(vals[..., 0:1], 3, axis=2)
    return np.ascontiguousarray(vals[..., :3])


@pytest.mark.parametrize("interlace", [0, 1])
@pytest.mark.parametrize("ctype,depth", _COMBOS)
def test_roundtrip_all_shapes(ctype, depth, interlace):
    """Random pixels through every (color type, depth, interlace)
    combination; sizes below 8 in one dimension make some Adam7
    passes empty, which the decoder must skip without consuming
    bytes."""
    rng = np.random.default_rng(ctype * 100 + depth * 10 + interlace)
    for w, h in [(1, 1), (3, 17), (16, 5),
                 (int(rng.integers(1, 21)), int(rng.integers(1, 19)))]:
        ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
        if ctype == 3:
            ncol = int(rng.integers(1, (1 << depth) + 1))
            palette = rng.integers(0, 256, size=(ncol, 3)).astype(np.uint8)
            samples = rng.integers(0, ncol, size=(h, w, 1))
        else:
            palette = None
            samples = rng.integers(0, 1 << depth, size=(h, w, ch))
        blob = _png_encode_ex(w, h, samples, ctype, depth, interlace,
                              palette, filter_seed=w + h)
        dw, dh, got = _decode_png(blob)
        assert (dw, dh) == (w, h)
        assert np.array_equal(got, _expected(samples, ctype, depth,
                                             palette))


@pytest.mark.parametrize("doc_id", range(16))
def test_variant_synth_matches_plain_arithmetic(doc_id):
    """RGBA / 16-bit / palette / Adam7 variants all decode to the
    same closed-form pixels as the plain 8-bit RGB synth, so the one
    SQL oracle certifies every decode shape."""
    w, h = doc_id % 13 + 4, doc_id % 11 + 4
    n = w * h * 3
    px = ((doc_id * 7 + 31 * np.arange(n, dtype=np.int64)) % 256
          ).astype(np.uint8).reshape(h, w, 3)
    dw, dh, got = _decode_png(_synth_png_variant_bytes(doc_id))
    assert (dw, dh) == (w, h)
    assert np.array_equal(got, px)


@pytest.mark.parametrize("maxval", [65535, 1023])
def test_ppm_16bit_samples(maxval):
    """PPM maxval > 255 (two-byte big-endian samples per the Netpbm
    spec) decodes with the exact v*255//maxval rescale — full-range
    65535 with hi==lo bytes round-trips the 8-bit value exactly."""
    from htmlparser_spark.operators.multimodal import _decode_rgb
    rng = np.random.default_rng(maxval)
    w, h = 5, 4
    s = rng.integers(0, maxval + 1, size=(h, w, 3)).astype(np.int64)
    blob = f"P6 {w} {h} {maxval}\n".encode() + s.astype(">u2").tobytes()
    dw, dh, got = _decode_rgb(blob)
    assert (dw, dh) == (w, h)
    assert np.array_equal(got, ((s * 255) // maxval).astype(np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        _decode_rgb(blob[:-3])
    with pytest.raises(ValueError, match="maxval"):
        _decode_rgb(b"P6 2 2 70000\n" + b"\x00" * 24)


def test_palette_index_out_of_range_rejected():
    pal = np.zeros((1, 3), np.uint8)
    blob = _png_encode_ex(3, 3, np.full((3, 3, 1), 1), 3, 8,
                          palette=pal)
    with pytest.raises(ValueError, match="palette index"):
        _decode_png(blob)


def test_invalid_depth_ctype_combo_rejected():
    """depth=16 with palette is invalid per §11.2.2 — reject, don't
    misdecode."""
    import zlib as z
    good = bytearray(_png_encode(4, 4, np.zeros((4, 4, 3), np.uint8)))
    ihdr = bytearray(good[16:29])
    ihdr[8], ihdr[9] = 16, 3
    patched = (bytes(good[:16]) + bytes(ihdr)
               + (z.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF
                  ).to_bytes(4, "big") + bytes(good[33:]))
    with pytest.raises(ValueError, match="combination invalid"):
        _decode_png(patched)


def test_adam7_trailing_bytes_rejected():
    """Extra bytes after the last pass are a malformed stream, not
    silently ignored."""
    samples = np.zeros((4, 4, 3), np.int64)
    blob = bytearray(_png_encode_ex(4, 4, samples, 2, 8, interlace=1))
    # rebuild with padded IDAT: inflate, append, re-deflate, re-chunk
    import zlib as z
    from htmlparser_spark.operators.multimodal import (_PNG_SIG,
                                                       _png_chunk)
    i = bytes(blob).find(b"IDAT") - 4
    ln = int.from_bytes(blob[i:i + 4], "big")
    raw = z.decompress(bytes(blob[i + 8:i + 8 + ln])) + b"\x00"
    patched = (bytes(blob[:i]) + _png_chunk(b"IDAT", z.compress(raw))
               + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="size mismatch"):
        _decode_png(patched)
