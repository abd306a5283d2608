"""Progressive JPEG (SOF2, ITU-T T.81 Annex G): the decoder's
multi-scan spectral-selection + successive-approximation path,
certified by encoding the SAME quantized coefficients both baseline
and progressive and requiring bit-identical decoded pixels, plus
crafted cases for the bit-ordering traps (EOBn runs, ZRL inside a
refinement scan, corrections crossing 16-zero boundaries)."""

import numpy as np
import pytest

from htmlparser_spark.operators.jpeg import (
    ZIGZAG, _synth_jpeg_bytes, decode_jpeg, encode_baseline_jpeg,
    encode_progressive_jpeg)


def _rand_blocks(rng, n, maxv=60):
    out = []
    for _ in range(n):
        q = np.zeros(64, dtype=np.int64)
        nz = int(rng.integers(0, 14))
        idx = rng.choice(np.arange(1, 64), size=nz, replace=False)
        q[idx] = rng.integers(-maxv, maxv + 1, size=nz)
        q[0] = int(rng.integers(-400, 400))
        out.append(q)
    return out


@pytest.mark.parametrize("doc_id", range(12))
def test_synth_progressive_matches_baseline(doc_id):
    """The SOF2 synth variant (4:4:4 even ids, 4:2:0 odd ids) carries
    the same coefficients as the baseline file, so decoded pixels —
    and therefore the SQL oracle — are identical."""
    bw_, bh_, base = decode_jpeg(_synth_jpeg_bytes(doc_id))
    pw_, ph_, prog = decode_jpeg(_synth_jpeg_bytes(doc_id,
                                                   progressive=True))
    assert (bw_, bh_) == (pw_, ph_)
    assert np.array_equal(base, prog)


@pytest.mark.parametrize("seed", range(16))
def test_fuzz_progressive_vs_baseline(seed):
    """Random coefficient images across 4:4:4 / 4:2:0 / 4:2:2 / 4:4:0
    with random restart intervals: the default Annex G scan script
    (DC first+refine, AC bands at Al=2..0, EOBn folding) must decode
    to exactly the baseline pixels."""
    rng = np.random.default_rng(seed)
    w = int(rng.integers(1, 40))
    h = int(rng.integers(1, 36))
    sampling = [((1, 1), (1, 1), (1, 1)), ((2, 2), (1, 1), (1, 1)),
                ((2, 1), (1, 1), (1, 1)),
                ((1, 2), (1, 1), (1, 1))][seed % 4]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    n_mcu = ((w + 8 * hmax - 1) // (8 * hmax)) \
        * ((h + 8 * vmax - 1) // (8 * vmax))
    blocks = [_rand_blocks(rng, n_mcu * hi * vi) for hi, vi in sampling]
    ri = int(rng.integers(0, 4))
    base = decode_jpeg(encode_baseline_jpeg(
        w, h, *blocks, restart_interval=ri, sampling=sampling))
    prog = decode_jpeg(encode_progressive_jpeg(
        w, h, *blocks, restart_interval=ri, sampling=sampling))
    assert base[:2] == prog[:2]
    assert np.array_equal(base[2], prog[2])


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_progressive_grayscale(seed):
    rng = np.random.default_rng(1000 + seed)
    w = int(rng.integers(1, 40))
    h = int(rng.integers(1, 36))
    qy = _rand_blocks(rng, ((w + 7) // 8) * ((h + 7) // 8))
    ri = int(rng.integers(0, 3))
    a = decode_jpeg(encode_baseline_jpeg(w, h, qy, restart_interval=ri))
    b = decode_jpeg(encode_progressive_jpeg(w, h, qy,
                                            restart_interval=ri))
    assert np.array_equal(a[2], b[2])


def test_eob_runs_longer_than_one_block():
    """17 consecutive all-zero-AC blocks fold into EOBn symbols with
    n > 0 extra bits — unreachable with the Annex K tables, reachable
    with the flat progressive AC table."""
    qy = [np.zeros(64, dtype=np.int64) for _ in range(18)]
    for i, q in enumerate(qy):
        q[0] = 5 * i - 40
    qy[7][30] = 3
    a = decode_jpeg(encode_baseline_jpeg(48, 24, qy))
    b = decode_jpeg(encode_progressive_jpeg(48, 24, qy))
    assert np.array_equal(a[2], b[2])


def test_zrl_inside_refinement_scan():
    """A coefficient becoming significant after a >16 zero-history
    run, with an already-significant coefficient buried inside the
    run: the correction bit must land in the 16-skip span the decoder
    traverses for the ZRL, not after the next symbol."""
    q = np.zeros(64, dtype=np.int64)
    q[0] = 10
    for k, v in [(2, 24), (10, 5), (30, 2), (55, 3)]:
        q[ZIGZAG[k]] = v
    blocks = [q, np.zeros(64, dtype=np.int64)]
    a = decode_jpeg(encode_baseline_jpeg(16, 8, blocks))
    b = decode_jpeg(encode_progressive_jpeg(16, 8, blocks))
    assert np.array_equal(a[2], b[2])


def test_corrections_across_multiple_16_boundaries():
    q = np.zeros(64, dtype=np.int64)
    q[0] = -100
    for k, v in [(1, 40), (5, 6), (20, 5), (37, 6), (45, 2), (63, 3)]:
        q[ZIGZAG[k]] = v
    a = decode_jpeg(encode_baseline_jpeg(8, 8, [q]))
    b = decode_jpeg(encode_progressive_jpeg(8, 8, [q]))
    assert np.array_equal(a[2], b[2])


def test_truncated_progressive_raises_valueerror():
    blob = encode_progressive_jpeg(
        16, 8, [np.zeros(64, dtype=np.int64) for _ in range(2)])
    with pytest.raises(ValueError):
        decode_jpeg(blob[:len(blob) // 2])


def test_arithmetic_frame_still_refused():
    blob = bytearray(encode_progressive_jpeg(
        8, 8, [np.zeros(64, dtype=np.int64)]))
    i = blob.find(b"\xff\xc2")
    blob[i + 1] = 0xC9                   # arithmetic sequential
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))
