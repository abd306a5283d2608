"""Lib-free baseline JPEG codec: exactness of the synth pattern,
entropy-layer fuzz against an independent per-definition IDCT,
restart markers, grayscale scans, non-multiple-of-8 crops, malformed
quarantine, and the honest non-baseline refusals."""

import numpy as np
import pytest

from htmlparser_spark.operators.jpeg import (
    QT_CHROMA, QT_LUM, ZIGZAG, _S44, _synth_jpeg_bytes, decode_jpeg,
    encode_baseline_jpeg, synth_block_params, synth_jpeg_dims,
)


def _ref_idct(deq):
    """Per-definition O(n^4) IDCT (T.81 A.3.3), row index = x,
    vertical frequency = u — independent of the module's matrix
    form."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = (1 / np.sqrt(2)) if u == 0 else 1.0
                    cv = (1 / np.sqrt(2)) if v == 0 else 1.0
                    s += (cu * cv * deq[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            out[x, y] = s / 4
    return out


def _ref_decode(w, h, qy, qcb, qcr):
    bw, bh = (w + 7) // 8, (h + 7) // 8
    planes = []
    for blocks, qt in ((qy, QT_LUM), (qcb, QT_CHROMA), (qcr, QT_CHROMA)):
        pl = np.zeros((bh * 8, bw * 8))
        for m, q in enumerate(blocks):
            by, bx = divmod(m, bw)
            deq = (np.asarray(q) * qt).reshape(8, 8).astype(float)
            pl[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = _ref_idct(deq) + 128
        planes.append(pl[:h, :w])
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    px = np.stack([r, g, b], axis=2)
    return np.clip(np.round(px), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 5, 7, 11, 100, 12345])
def test_synth_pattern_decodes_exactly(doc_id):
    w, h, px = decode_jpeg(_synth_jpeg_bytes(doc_id))
    assert (w, h) == synth_jpeg_dims(doc_id)
    bw = w // 8
    exp = np.zeros((h, w), np.int64)
    for bi in range(bw * (h // 8)):
        by, bx = divmod(bi, bw)
        v, e = synth_block_params(doc_id, bi)
        exp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
            v + 17 * e * np.outer(_S44, _S44)
    for c in range(3):                      # gray: all channels equal
        assert (px[:, :, c].astype(np.int64) == exp).all()


@pytest.mark.parametrize("doc_id", [0, 4, 9, 77])
def test_synth_witness_identities(doc_id):
    """The two oracle identities: plain sum = sigma 64*v_b (AC
    cancels), sign-weighted sum = sigma 1088*e_b (DC cancels)."""
    w, h, px = decode_jpeg(_synth_jpeg_bytes(doc_id))
    nb = (w // 8) * (h // 8)
    params = [synth_block_params(doc_id, bi) for bi in range(nb)]
    ch = px[:, :, 0].astype(np.int64)
    assert int(ch.sum()) == sum(64 * v for v, _ in params)
    sx = np.resize(_S44, w)[None, :]
    sy = np.resize(_S44, h)[:, None]
    assert int((ch * sx * sy).sum()) == sum(1088 * e for _, e in params)


def _rand_blocks(rng, n, maxv=60):
    out = []
    for _ in range(n):
        q = np.zeros(64, np.int64)
        nz = int(rng.integers(0, 14))
        idx = rng.choice(np.arange(1, 64), size=nz, replace=False)
        q[idx] = rng.integers(-maxv, maxv + 1, size=nz)
        q[0] = int(rng.integers(-400, 400))
        out.append(q)
    return out


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_roundtrip_vs_reference_idct(seed):
    """Random quantized coefficients — every run/size class, ZRL,
    EOB, byte stuffing, non-multiple-of-8 crops, restart markers —
    encode then decode must match an independent reference decode.
    Both sides round the same float64 pipeline; exact-tie .5 cases
    are measure-zero for random integer coefficients, so equality is
    asserted within 1 gray level and must be exact almost
    everywhere."""
    rng = np.random.default_rng(seed)
    w = int(rng.integers(1, 36))
    h = int(rng.integers(1, 30))
    n = ((w + 7) // 8) * ((h + 7) // 8)
    qy, qcb, qcr = (_rand_blocks(rng, n) for _ in range(3))
    ri = int(rng.integers(0, 4))
    blob = encode_baseline_jpeg(w, h, qy, qcb, qcr, restart_interval=ri)
    dw, dh, got = decode_jpeg(blob)
    assert (dw, dh) == (w, h)
    exp = _ref_decode(w, h, qy, qcb, qcr)
    diff = got.astype(np.int64) - exp.astype(np.int64)
    assert np.abs(diff).max() <= 1
    assert (diff != 0).mean() < 0.001


def _ref_decode_sampled(w, h, blocks, sampling):
    """Sampling-aware reference decode: per-component planes filled
    in MCU-major / within-MCU-raster order, naive IDCT, replication
    upsample, crop, JFIF color transform."""
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcols = (w + 8 * hmax - 1) // (8 * hmax)
    mrows = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for ci, (bl, qt) in enumerate(zip(blocks,
                                      (QT_LUM, QT_CHROMA, QT_CHROMA))):
        hi, vi = sampling[ci]
        pl = np.zeros((mrows * 8 * vi, mcols * 8 * hi))
        for m in range(mcols * mrows):
            mrow, mcol = divmod(m, mcols)
            for u in range(hi * vi):
                yy, xx = divmod(u, hi)
                deq = (np.asarray(bl[m * hi * vi + u]) * qt) \
                    .reshape(8, 8).astype(float)
                r0 = (mrow * vi + yy) * 8
                c0 = (mcol * hi + xx) * 8
                pl[r0:r0 + 8, c0:c0 + 8] = _ref_idct(deq) + 128
        pl = np.repeat(np.repeat(pl, vmax // vi, axis=0),
                       hmax // hi, axis=1)[:h, :w]
        planes.append(pl)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    px = np.stack([r, g, b], axis=2)
    return np.clip(np.round(px), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("sampling,seed", [
    (((2, 2), (1, 1), (1, 1)), 0),   # 4:2:0 — the dominant web shape
    (((2, 2), (1, 1), (1, 1)), 1),
    (((2, 1), (1, 1), (1, 1)), 2),   # 4:2:2
    (((1, 2), (1, 1), (1, 1)), 3),   # 4:4:0
])
def test_fuzz_subsampled_roundtrip(sampling, seed):
    rng = np.random.default_rng(100 + seed)
    w = int(rng.integers(1, 40))
    h = int(rng.integers(1, 36))
    hmax, vmax = sampling[0]
    mcols = (w + 8 * hmax - 1) // (8 * hmax)
    mrows = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mcols * mrows
    blocks = [_rand_blocks(rng, n_mcu * hi * vi)
              for hi, vi in sampling]
    ri = int(rng.integers(0, 3))
    blob = encode_baseline_jpeg(w, h, *blocks, restart_interval=ri,
                                sampling=sampling)
    dw, dh, got = decode_jpeg(blob)
    assert (dw, dh) == (w, h)
    exp = _ref_decode_sampled(w, h, blocks, sampling)
    diff = got.astype(np.int64) - exp.astype(np.int64)
    assert np.abs(diff).max() <= 1
    assert (diff != 0).mean() < 0.001


def test_synth_420_and_444_share_the_closed_form():
    """Odd doc_ids synth as 4:2:0, even as 4:4:4; both must decode to
    the SAME closed-form pixels (that is what lets one SQL oracle
    certify both subsampling paths)."""
    for did in (1, 3, 7, 11):                       # odd -> 4:2:0
        blob = _synth_jpeg_bytes(did)
        sof = blob.find(b"\xff\xc0")
        assert blob[sof + 11] == 0x22               # SOF carries 2x2 Y
        w, h, px = decode_jpeg(blob)
        bw = w // 8
        for bi in range(bw * (h // 8)):
            by, bx = divmod(bi, bw)
            v, e = synth_block_params(did, bi)
            blk = v + 17 * e * np.outer(_S44, _S44)
            assert (px[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8, 0]
                    .astype(np.int64) == blk).all()


def test_grayscale_single_component_scan():
    rng = np.random.default_rng(7)
    w, h = 20, 12
    n = ((w + 7) // 8) * ((h + 7) // 8)
    qy = _rand_blocks(rng, n)
    blob = encode_baseline_jpeg(w, h, qy)          # no chroma
    dw, dh, px = decode_jpeg(blob)
    assert (dw, dh) == (w, h)
    assert (px[:, :, 0] == px[:, :, 1]).all()
    assert (px[:, :, 2] == px[:, :, 0]).all()
    zero = [np.zeros(64, np.int64)] * n
    exp = _ref_decode(w, h, qy, zero, zero)        # gray == Y plane
    assert np.abs(px.astype(np.int64) - exp.astype(np.int64)).max() <= 1


def test_restart_markers_reset_dc_prediction():
    """Same blocks with and without DRI must decode identically —
    the RSTn path realigns the stream and resets predictors."""
    did = 42
    a = decode_jpeg(_synth_jpeg_bytes(did))
    b = decode_jpeg(_synth_jpeg_bytes(did, restart_interval=2))
    assert (a[2] == b[2]).all()


def test_malformed_inputs_raise_valueerror():
    good = _synth_jpeg_bytes(3)
    for bad in (b"\x00\x01", good[:20], good[:len(good) // 2],
                good[:2] + b"\x00" + good[3:]):
        with pytest.raises(ValueError):
            decode_jpeg(bad)


def test_nonbaseline_refusals_are_marked():
    good = bytearray(_synth_jpeg_bytes(3))
    sof = good.find(b"\xff\xc0")
    assert sof > 0
    # progressive (SOF2) is decoded since round 5; lossless (SOF3)
    # stays an honest refusal
    lossless = bytes(good[:sof + 1]) + b"\xc3" + bytes(good[sof + 2:])
    with pytest.raises(NotImplementedError):
        decode_jpeg(lossless)
    # sampling factor above 2 inside SOF (first component 3x3)
    sub = bytearray(good)
    sub[sof + 2 + 2 + 5 + 1 + 1] = 0x33
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(sub))


def test_decode_rgb_dispatches_jpeg():
    """multimodal's shared entry now decodes JPEG instead of
    refusing, so every downstream image op (ahash, near-dups,
    pipeline) accepts JPEG blobs unchanged."""
    from htmlparser_spark.operators.multimodal import _decode_rgb
    blob = _synth_jpeg_bytes(9)
    w, h, px = _decode_rgb(blob)
    assert (w, h) == synth_jpeg_dims(9)
    assert px.shape == (h, w, 3)


def test_spark_jpeg_stats_and_ahash(spark):
    """End-to-end through the Spark surface: synth 40 JPEGs,
    decode stats match the closed form, and image_ahash accepts the
    blobs through the shared _decode_rgb entry."""
    from htmlparser_spark.operators.jpeg import (
        jpeg_decode_stats, synth_jpeg_blob)
    from htmlparser_spark.operators.multimodal import image_ahash

    docs = spark.range(40).withColumnRenamed("id", "doc_id")
    media = synth_jpeg_blob(docs)
    rows = {r["doc_id"]: r for r in jpeg_decode_stats(media).collect()}
    assert len(rows) == 40
    for did, r in rows.items():
        w, h = synth_jpeg_dims(did)
        nb = (w // 8) * (h // 8)
        params = [synth_block_params(did, bi) for bi in range(nb)]
        assert (r["width"], r["height"]) == (w, h)
        assert r["sum_r"] == r["sum_g"] == r["sum_b"] \
            == sum(64 * v for v, _ in params)
        assert r["ac_r"] == sum(1088 * e for _, e in params)
    hashes = image_ahash(media).collect()
    assert len(hashes) == 40
    assert all(r["ahash"] is not None for r in hashes)
