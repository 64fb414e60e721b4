"""Equivalence tests for the vectorized JPEG entropy coder and the
lockstep batch decoder (round-14 optimization): byte-identical scans vs
the sequential reference coder, and array-identical batch decodes vs the
scalar decoder — including the entropy-coding corner cases (ZRL runs,
blocks ending in coefficient 63 with no EOB, negative amplitudes,
multi-table category edges)."""

import numpy as np
import pytest

from gridmr_spark.operators.jpeg import (
    _AC_BITS,
    _AC_VALS,
    _amplitude,
    _BitWriter,
    _build_codes,
    _category,
    _DC_BITS,
    _DC_VALS,
    _DCT,
    _encode_scan,
    _ZIGZAG,
    default_qtable,
    jpeg_decode_gray,
    jpeg_decode_gray_many,
    jpeg_encode_gray,
)


def reference_scan(zz: np.ndarray) -> bytes:
    """The original per-block sequential entropy coder, kept verbatim as
    the executable spec the vectorized `_encode_scan` must match."""
    dc_codes = _build_codes(_DC_BITS, _DC_VALS)
    ac_codes = _build_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for blk in zz:
        diff = int(blk[0]) - prev_dc
        prev_dc = int(blk[0])
        s = _category(diff)
        c, ln = dc_codes[s]
        bw.write(c, ln)
        if s:
            bw.write(_amplitude(diff, s), s)
        run = 0
        nz = np.flatnonzero(blk[1:])
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(blk[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]
                bw.write(c, ln)
                run -= 16
            s = _category(v)
            c, ln = ac_codes[(run << 4) | s]
            bw.write(c, ln)
            bw.write(_amplitude(v, s), s)
            run = 0
        if last < 63:
            c, ln = ac_codes[0x00]
            bw.write(c, ln)
    return bw.flush()


def _quantized_zz(arr: np.ndarray, Q: np.ndarray) -> np.ndarray:
    h, w = arr.shape
    f = arr.astype(np.float64).reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) - 128.0
    F = np.einsum("ux,bcxy,vy->bcuv", _DCT, f, _DCT)
    coeff = np.rint(F / Q[None, None]).astype(np.int64)
    return coeff.reshape(-1, 64)[:, _ZIGZAG]


def _corpus():
    rng = np.random.default_rng(42)
    imgs = []
    # constant blocks (the oracle workload: DC-only, EOB every block)
    imgs.append(np.repeat(np.repeat(rng.integers(0, 256, (5, 7), dtype=np.uint8), 8, 0), 8, 1))
    # random noise (dense ACs under Q=1, sparse under default Q)
    imgs.append(rng.integers(0, 256, (24, 32), dtype=np.uint8))
    # checkerboard: energy at zigzag 63 -> blocks that end WITHOUT an EOB
    cb = np.zeros((16, 16), dtype=np.uint8)
    cb[::2, ::2] = 255
    cb[1::2, 1::2] = 255
    imgs.append(cb)
    # smooth gradient: long zero runs between isolated coefficients (ZRL)
    g = np.add.outer(np.arange(32), np.arange(64)) % 256
    imgs.append(g.astype(np.uint8))
    # single block, all-zero after quantization
    imgs.append(np.full((8, 8), 128, dtype=np.uint8))
    return imgs


@pytest.mark.parametrize("q_ac", [1, 16])
def test_encode_scan_matches_sequential_reference(q_ac):
    Q = default_qtable(q_dc=8 if q_ac != 1 else 1, q_ac=q_ac)
    for arr in _corpus():
        zz = _quantized_zz(arr, Q)
        assert _encode_scan(zz) == reference_scan(zz)


def test_zrl_and_no_eob_paths_match_reference():
    # Hand-built coefficient blocks exercising every RLE branch:
    blocks = np.zeros((6, 64), dtype=np.int64)
    blocks[0, 0] = 40  # DC only -> EOB
    blocks[1, [0, 1, 63]] = [40, -3, 7]  # ends at 63 -> NO EOB, run 61 -> 3 ZRL + rem 13
    blocks[2, [0, 17]] = [-100, 1]  # run 16 -> exactly one ZRL, rem 0
    blocks[3, [0, 33]] = [0, -1023]  # max AC category, run 32 -> 2 ZRL
    blocks[4, 0] = -1024  # DC diff -1024 from prev -100... category edge
    blocks[5, 1:64] = 1  # fully dense, no zeros
    assert _encode_scan(blocks) == reference_scan(blocks)


def test_batch_decode_matches_scalar():
    payloads = []
    for q_ac in (1, 16):
        Q = default_qtable(q_dc=8 if q_ac != 1 else 1, q_ac=q_ac)
        payloads.extend(jpeg_encode_gray(a, Q) for a in _corpus())
    batch = jpeg_decode_gray_many(payloads)
    for got, p in zip(batch, payloads):
        np.testing.assert_array_equal(got, jpeg_decode_gray(p))


def test_batch_decode_empty_and_single():
    assert jpeg_decode_gray_many([]) == []
    p = jpeg_encode_gray(np.full((8, 8), 200, dtype=np.uint8))
    (got,) = jpeg_decode_gray_many([p])
    np.testing.assert_array_equal(got, jpeg_decode_gray(p))


def test_batch_decode_truncated_stream_raises_like_scalar():
    p = jpeg_encode_gray(np.arange(64, dtype=np.uint8).reshape(8, 8) * 3 % 256)
    bad = p[:-6]  # chop EOI + scan tail -> scalar raises mid-entropy-decode
    with pytest.raises(Exception) as scalar_err:
        jpeg_decode_gray(bad)
    with pytest.raises(Exception) as batch_err:
        jpeg_decode_gray_many([p, bad])
    assert type(batch_err.value) is type(scalar_err.value)


def test_roundtrip_lossless_constant_blocks():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 256, (9, 16), dtype=np.uint8)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    out = jpeg_decode_gray(jpeg_encode_gray(img))
    np.testing.assert_array_equal(out, img)


def test_batch_decode_header_failure_routes_per_stream():
    """A stream whose HEADER fails to parse (not just its scan) must take
    the same per-stream scalar fallback as scan-level failures: the batch
    raises the scalar decoder's exact exception type instead of a batch-
    wide parse abort, and the parseable streams still decode through the
    lockstep path (ADVICE r14)."""
    p = jpeg_encode_gray(np.arange(64, dtype=np.uint8).reshape(8, 8) * 5 % 256)
    bad_header = p[:4] + b"\x00" * 8  # SOI then garbage: header parse fails
    with pytest.raises(Exception) as scalar_err:
        jpeg_decode_gray(bad_header)
    with pytest.raises(Exception) as batch_err:
        jpeg_decode_gray_many([p, bad_header])
    assert type(batch_err.value) is type(scalar_err.value)
    # A batch that mixes only parseable streams after the split still
    # returns scalar-identical arrays.
    (got,) = jpeg_decode_gray_many([p])
    np.testing.assert_array_equal(got, jpeg_decode_gray(p))
