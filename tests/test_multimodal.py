"""Real image decode: byte-layout tests for the lib-free formats
(PPM P6 / BMP-24) plus the Spark plumbing around them."""

import struct

import numpy as np
import pytest

from htmlparser_spark.operators.multimodal import (
    _decode_rgb, decode_image_features, decode_image_pixels,
    synth_ppm_blob)


def make_bmp24(pixels: np.ndarray, bottom_up: bool = True) -> bytes:
    """Hand-rolled 24-bit uncompressed BMP from an (h, w, 3) RGB array —
    written the way the format really stores it: BGR samples, rows
    padded to 4 bytes, bottom-up unless height is negative."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    rows = pixels[::-1] if bottom_up else pixels
    body = bytearray()
    for r in rows:
        line = r[:, ::-1].tobytes()                      # RGB → BGR
        body += line + b"\x00" * (stride - len(line))
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w,
                            h if bottom_up else -h, 1, 24, 0,
                            len(body), 2835, 2835, 0, 0))
    return bytes(header + body)


PX = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
               [[10, 20, 30], [40, 50, 60], [70, 80, 90]]], dtype=np.uint8)


def test_bmp24_decode_bottom_up_and_top_down():
    for bottom_up in (True, False):
        w, h, got = _decode_rgb(make_bmp24(PX, bottom_up))
        assert (w, h) == (3, 2)
        assert np.array_equal(got, PX)


def test_bmp24_rejects_compressed_or_deep():
    blob = bytearray(make_bmp24(PX))
    blob[30] = 1                                          # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        _decode_rgb(bytes(blob))


def test_ppm_header_with_comments():
    px = PX.reshape(-1).tobytes()
    blob = b"P6\n# a comment\n3 2\n# another\n255\n" + px
    w, h, got = _decode_rgb(blob)
    assert (w, h) == (3, 2)
    assert np.array_equal(got, PX)


def test_ppm_truncated_raises():
    with pytest.raises(ValueError, match="truncated"):
        _decode_rgb(b"P6\n3 2\n255\n\x00\x01")


def test_jpeg_needs_library():
    with pytest.raises(NotImplementedError, match="PIL"):
        _decode_rgb(b"\xff\xd8\xff\xe0rest-of-jpeg")


def test_decode_pixels_spark_roundtrip(spark):
    """synth → decode over mapInPandas: sums must equal numpy's direct
    computation of the generation formula, and None blobs pass through
    as nulls."""
    ids = spark.range(7).withColumnRenamed("id", "doc_id")
    out = decode_image_pixels(synth_ppm_blob(ids)).orderBy("doc_id")
    rows = out.collect()
    assert len(rows) == 7
    for r in rows:
        i = r.doc_id
        w, h = i % 13 + 4, i % 11 + 4
        px = (i * 7 + 31 * np.arange(w * h * 3, dtype=np.int64)) % 256
        assert (r.width, r.height) == (w, h)
        assert [r.sum_r, r.sum_g, r.sum_b] == \
            [int(px[c::3].sum()) for c in range(3)]


def test_decode_features_real_path(spark):
    """fake=False now really decodes: features = [w, h, mean_r/g/b,
    0...] for PPM input."""
    ids = spark.range(3).withColumnRenamed("id", "doc_id")
    out = decode_image_features(synth_ppm_blob(ids), fake=False) \
        .orderBy("doc_id").collect()
    for r in out:
        i = r.doc_id
        w, h = i % 13 + 4, i % 11 + 4
        px = ((i * 7 + 31 * np.arange(w * h * 3, dtype=np.int64)) % 256) \
            .reshape(-1, 3)
        exp = [w, h] + [float(np.float32(px[:, c].mean())) for c in range(3)]
        assert r.features[:5] == pytest.approx(exp, rel=1e-6)
        assert r.features[5:] == [0.0, 0.0, 0.0]
