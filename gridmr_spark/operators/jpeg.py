"""Baseline JPEG (ITU T.81) grayscale codec — stdlib + numpy only.

The second REAL image codec beside the stdlib PNG pair
(multimodal.png_encode_gray/png_decode_gray): a full baseline sequential
DCT encoder and decoder for 8-bit grayscale, so the repo's image seam
(`multimodal._decode_gray_any`) handles the two formats that dominate real
corpora without PIL. Everything is from the public spec: 2-D DCT-II with
the standard 1/4·c(u)c(v) scaling, zigzag, run-length + canonical Huffman
entropy coding with the Annex K luminance tables, 0xFF byte stuffing,
JFIF/SOI/DQT/SOF0/DHT/SOS/EOI framing. Files interoperate with any
standard tool (verified against PIL when present).

JPEG is lossy in general; the oracle trick the multimodal_jpeg_decode
query uses is that it is EXACTLY lossless for images that are constant on
each 8x8 block when the DC quantization step is 8: a constant block v has
DC = 8·(v-128) and all-zero AC, so quantization divides exactly, and the
float DCT/IDCT error (~1e-13) vanishes under the final integer rounding.
The pytest suite additionally round-trips arbitrary (non-constant) images
under a PSNR floor — the codec is a real codec, not a constant-block toy.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU T.81 Annex K.3 typical luminance Huffman tables (public constants).
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ]
)


def _dct_matrix() -> np.ndarray:
    """M with F = M @ f @ M.T the standard JPEG forward DCT scaling."""
    x = np.arange(8)
    M = np.cos((2 * x[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16) / 2.0
    M[0] *= 1.0 / np.sqrt(2.0)
    return M


_DCT = _dct_matrix()
# Flattened 64x64 transform matrices: one (n_blocks, 64) @ (64, 64) GEMM
# replaces n_blocks tiny 8x8 matmuls (which thrash BLAS thread pools and
# dominate decode wall time). f_flat = F_flat @ _IDCT64 computes
# f[x,y] = sum_{u,v} M[u,x] F[u,v] M[v,y]; F_flat = f_flat @ _DCT64 is the
# forward twin. kron(M, M)[uv, xy] = M[u,x] M[v,y] gives exactly that.
_IDCT64 = np.kron(_DCT, _DCT)
_DCT64 = _IDCT64.T.copy()


def default_qtable(q_dc: int = 8, q_ac: int = 16) -> np.ndarray:
    """Flat quantization table: DC step ``q_dc`` (8 = exact for
    block-constant content), AC step ``q_ac``."""
    Q = np.full((8, 8), q_ac, dtype=np.int64)
    Q[0, 0] = q_dc
    return Q


def _build_codes(bits, vals):
    """Canonical Huffman assignment: symbol -> (code, length)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


# Vectorized-coder lookup tables: category (bit_length) of |v|, and the
# Annex-K canonical Huffman codes as flat arrays indexed by symbol.
_CAT_LUT = np.zeros(1 << 12, dtype=np.int64)
for _v in range(1, 1 << 12):
    _CAT_LUT[_v] = _v.bit_length()


def _code_arrays(bits, vals, n_syms):
    codes = np.zeros(n_syms, dtype=np.int64)
    lens = np.zeros(n_syms, dtype=np.int64)
    for sym, (c, ln) in _build_codes(bits, vals).items():
        codes[sym] = c
        lens[sym] = ln
    return codes, lens


_DC_CODE, _DC_LEN = _code_arrays(_DC_BITS, _DC_VALS, 12)
_AC_CODE, _AC_LEN = _code_arrays(_AC_BITS, _AC_VALS, 256)


def _encode_scan(zz: np.ndarray) -> bytes:
    """Entropy-code quantized zigzag blocks (n, 64) into the stuffed scan
    byte stream — the vectorized twin of the per-block `_BitWriter` loop.
    Builds every (code, length) pair of the symbol stream with numpy
    (DC diff + category, AC run-length with ZRL splitting, EOB), lexsorts
    them into stream order, bit-packs with `np.packbits` (1-padded per
    spec) and inserts the 0xFF00 stuffing in one pass. Byte-identical to
    the sequential coder (asserted in tests/test_jpeg_vectorized.py)."""
    n = zz.shape[0]
    dc = zz[:, 0]
    diff = np.diff(dc, prepend=np.int64(0))
    adiff = np.abs(diff)
    if adiff.max(initial=0) > 2047:
        raise ValueError("DC difference out of category range")
    s_dc = _CAT_LUT[adiff]

    parts_bid = [np.arange(n, dtype=np.int64)]
    parts_key = [np.zeros(n, dtype=np.int64)]
    parts_code = [_DC_CODE[s_dc]]
    parts_len = [_DC_LEN[s_dc]]

    amp_rows = np.flatnonzero(s_dc > 0)
    if amp_rows.size:
        d = diff[amp_rows]
        s = s_dc[amp_rows]
        parts_bid.append(amp_rows)
        parts_key.append(np.ones(amp_rows.size, dtype=np.int64))
        parts_code.append(np.where(d >= 0, d, d + (np.int64(1) << s) - 1))
        parts_len.append(s)

    bid, pos0 = np.nonzero(zz[:, 1:])
    if bid.size:
        i_idx = pos0 + 1  # zigzag coefficient index 1..63
        val = zz[bid, i_idx]
        first = np.empty(bid.size, dtype=bool)
        first[0] = True
        first[1:] = bid[1:] != bid[:-1]
        prev_i = np.where(first, 0, np.concatenate(([0], i_idx[:-1])))
        run = i_idx - prev_i - 1
        zrl = run >> 4
        rem = run & 15
        aval = np.abs(val)
        if aval.max(initial=0) > 1023:
            raise ValueError("AC coefficient out of category range")
        s_ac = _CAT_LUT[aval]
        sym = (rem << 4) | s_ac
        base = 2 + i_idx * 8  # within-block order: after DC entries (keys 0,1)

        if zrl.any():
            csum = np.cumsum(zrl)
            starts = csum - zrl
            intra = np.arange(csum[-1], dtype=np.int64) - np.repeat(starts, zrl)
            parts_bid.append(np.repeat(bid, zrl))
            parts_key.append(np.repeat(base, zrl) + intra)
            parts_code.append(np.full(csum[-1], _AC_CODE[0xF0]))
            parts_len.append(np.full(csum[-1], _AC_LEN[0xF0]))

        parts_bid.append(bid)
        parts_key.append(base + 4)
        parts_code.append(_AC_CODE[sym])
        parts_len.append(_AC_LEN[sym])

        parts_bid.append(bid)
        parts_key.append(base + 5)
        parts_code.append(np.where(val >= 0, val, val + (np.int64(1) << s_ac) - 1))
        parts_len.append(s_ac)

        last = np.zeros(n, dtype=np.int64)
        tail = np.empty(bid.size, dtype=bool)
        tail[-1] = True
        tail[:-1] = bid[1:] != bid[:-1]
        last[bid[tail]] = i_idx[tail]
    else:
        last = np.zeros(n, dtype=np.int64)

    eob_blocks = np.flatnonzero(last < 63)
    if eob_blocks.size:
        parts_bid.append(eob_blocks)
        parts_key.append(np.full(eob_blocks.size, 2 + 64 * 8, dtype=np.int64))
        parts_code.append(np.full(eob_blocks.size, _AC_CODE[0x00]))
        parts_len.append(np.full(eob_blocks.size, _AC_LEN[0x00]))

    allbid = np.concatenate(parts_bid)
    allkey = np.concatenate(parts_key)
    allcode = np.concatenate([np.asarray(p, dtype=np.int64) for p in parts_code])
    alllen = np.concatenate([np.asarray(p, dtype=np.int64) for p in parts_len])
    order = np.lexsort((allkey, allbid))
    codes_o = allcode[order]
    lens_o = alllen[order]

    ends = np.cumsum(lens_o)
    total = int(ends[-1]) if ends.size else 0
    sym_of_bit = np.repeat(np.arange(lens_o.size, dtype=np.int64), lens_o)
    shift = ends[sym_of_bit] - 1 - np.arange(total, dtype=np.int64)
    bits = ((codes_o[sym_of_bit] >> shift) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])
    scan = np.packbits(bits)
    ff = np.flatnonzero(scan == 0xFF)
    if ff.size:
        scan = np.insert(scan, ff + 1, np.uint8(0))
    return scan.tobytes()


def jpeg_encode_gray(arr: np.ndarray, qtable: np.ndarray | None = None) -> bytes:
    """Encode an (h, w) uint8 array as a baseline JFIF grayscale JPEG.
    h and w must be multiples of 8 (the callers tile content that way;
    general padding would change the oracle's pixel set)."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape
    if h % 8 or w % 8 or h == 0 or w == 0:
        raise ValueError("jpeg_encode_gray needs non-empty dims divisible by 8")
    Q = default_qtable() if qtable is None else np.asarray(qtable, dtype=np.int64)
    # blockwise DCT, vectorized over all blocks at once
    f = arr.astype(np.float64).reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) - 128.0
    F = (f.reshape(-1, 64) @ _DCT64).reshape(h // 8, w // 8, 8, 8)
    coeff = np.rint(F / Q[None, None]).astype(np.int64)
    zz = coeff.reshape(-1, 64)[:, _ZIGZAG]  # (n_blocks, 64) in zigzag order
    scan = _encode_scan(zz)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
    out += seg(0xFFDB, b"\x00" + Q.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes())
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += scan + b"\xff\xd9"  # EOI
    return out


def _unstuff_scan(data: bytes, scan_start: int) -> bytes:
    """Entropy-coded bytes from scan_start to EOI, with 0xFF00 stuffing
    removed — one numpy pass instead of per-byte Python. Any other marker
    inside the scan (restarts are never emitted by our encoder) raises."""
    raw = np.frombuffer(data, dtype=np.uint8)[scan_start:]
    ff = np.flatnonzero(raw[:-1] == 0xFF)
    nxt = raw[ff + 1]
    eoi_hits = ff[nxt == 0xD9]
    end = int(eoi_hits[0]) if len(eoi_hits) else len(raw)
    bad = ff[(nxt != 0x00) & (nxt != 0xD9) & (ff < end)]
    if len(bad):
        code = int(raw[bad[0] + 1])
        raise ValueError(f"unsupported marker 0xff{code:02x} in scan (restarts not emitted)")
    body = raw[:end]
    stuffed = ff[(nxt == 0x00) & (ff + 1 < end)] + 1  # the 0x00 stuffing bytes
    if len(stuffed):
        body = np.delete(body, stuffed)
    return body.tobytes()


def _build_lut(bits, vals) -> np.ndarray:
    """Fast canonical-Huffman decode table: next 16 bits -> (length << 8) |
    symbol, one array index per symbol instead of bit-by-bit dict probes.
    Entries left at 0 are invalid codes (length 0)."""
    lut = np.zeros(1 << 16, dtype=np.uint16)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            lut[lo:hi] = (length << 8) | vals[k]
            code += 1
            k += 1
        code <<= 1
    return lut


class _BitReader:
    """MSB-first accumulator bit reader over pre-unstuffed scan bytes.
    Two zero pad bytes let peek16 run to the exact end of the stream; a
    symbol that would CONSUME padding means the scan ended early (EOI mid
    read) and raises EOFError like the byte-at-a-time reader did."""

    __slots__ = ("buf", "real_bits", "pos", "acc", "nbits")

    def __init__(self, scan: bytes):
        self.buf = scan + b"\x00\x00\x00"
        self.real_bits = 8 * len(scan)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _need(self, n: int) -> None:
        while self.nbits < n:
            self.acc = (self.acc << 8) | self.buf[self.pos]
            self.pos += 1
            self.nbits += 8

    def peek16(self) -> int:
        self._need(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def consume(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        if self.pos * 8 - self.nbits > self.real_bits:
            raise EOFError("hit EOI")

    def bits(self, n: int) -> int:
        self._need(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.consume(n)
        return v


def _read_symbol(br: _BitReader, lut: np.ndarray) -> int:
    entry = int(lut[br.peek16()])
    length = entry >> 8
    if length == 0:
        raise ValueError("invalid Huffman code in scan")
    br.consume(length)
    return entry & 0xFF


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


from functools import lru_cache


@lru_cache(maxsize=64)
def _lut_cached(table_bytes: bytes) -> np.ndarray:
    """Decode LUT for a Huffman table serialized as 16 BITS bytes + VALS."""
    bits = list(table_bytes[:16])
    n = sum(bits)
    return _build_lut(bits, list(table_bytes[16 : 16 + n]))


def _parse_jpeg(data: bytes):
    """Parse the marker stream of a baseline single-component grayscale
    JPEG. Returns (h, w, Q natural-order (8,8), dc_table_key, ac_table_key,
    unstuffed scan bytes); the table keys feed `_lut_cached`. Shared by the
    scalar and the batched decoder — identical validation either way."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], bytes] = {}
    h = w = None
    comp_q = 0
    scan_start = None
    dc_id = ac_id = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        length = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + length]
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                q = np.zeros(64, dtype=np.int64)
                q[_ZIGZAG] = np.frombuffer(body[off + 1 : off + 65], np.uint8)
                qtables[tq] = q.reshape(8, 8)
                off += 65
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise ValueError("only 8-bit single-component baseline supported")
            if body[7] != 0x11:
                raise ValueError("subsampling unsupported for grayscale")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                huff[(tc, th)] = bytes(body[off + 1 : off + 17 + n])
                off += 17 + n
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:
            dc_id, ac_id = body[2] >> 4, body[2] & 0xF
            scan_start = pos + 2 + length
            break
        pos += 2 + length
    if scan_start is None or h is None:
        raise ValueError("JPEG missing SOS/SOF0")
    return h, w, qtables[comp_q], huff[(0, dc_id)], huff[(1, ac_id)], _unstuff_scan(data, scan_start)


def jpeg_decode_gray(data: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG to an (h, w) uint8 array. Supports
    what a single-component baseline stream needs: DQT (8-bit), SOF0 with
    one component, DHT, SOS without restart intervals; other APPn/COM
    segments are skipped by length."""
    h, w, Q, dc_key, ac_key, scan = _parse_jpeg(data)
    dc_lut, ac_lut = _lut_cached(dc_key), _lut_cached(ac_key)

    br = _BitReader(scan)
    bh, bw_ = -(-h // 8), -(-w // 8)
    nblk = bh * bw_
    # Entropy decode every block into a zigzag coefficient matrix first;
    # dequantization + IDCT then run ONCE over all blocks (einsum), which
    # moves the per-block 8x8 matmuls out of the Python loop.
    zz = np.zeros((nblk, 64), dtype=np.int64)
    prev_dc = 0
    for b in range(nblk):
        s = _read_symbol(br, dc_lut)
        diff = _extend(br.bits(s), s) if s else 0
        prev_dc += diff
        zz[b, 0] = prev_dc
        i = 1
        while i < 64:
            sym = _read_symbol(br, ac_lut)
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0xF
            if size == 0:
                if run != 15:
                    raise ValueError("invalid AC symbol")
                i += 16  # ZRL
                continue
            i += run
            if i >= 64:
                raise ValueError("AC run overflows block")
            zz[b, i] = _extend(br.bits(size), size)
            i += 1
    coeff = np.zeros((nblk, 64), dtype=np.int64)
    coeff[:, _ZIGZAG] = zz
    F = coeff.reshape(nblk, 8, 8) * Q[None]
    f = (F.reshape(-1, 64).astype(np.float64) @ _IDCT64).reshape(-1, 8, 8)
    blocks = np.clip(np.rint(f + 128.0), 0, 255).astype(np.uint8)
    out = (
        blocks.reshape(bh, bw_, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw_ * 8)
    )
    return out[:h, :w]


def jpeg_decode_gray_many(datas) -> list:
    """Decode a batch of baseline grayscale JPEGs at once — the lockstep
    twin of `jpeg_decode_gray` for Arrow-batched callers.

    Huffman decoding is bit-serial WITHIN a stream, but independent ACROSS
    streams, so the entropy decoder runs all streams in lockstep: one
    round decodes one Huffman symbol (+ its amplitude bits) for EVERY
    still-active stream with vectorized LUT gathers over a shared byte
    buffer. Round count is the max symbol count of any stream in the
    batch, so per-symbol interpreted-Python cost is amortized across the
    batch. Dequantization + IDCT then run as one chunked einsum over ALL
    blocks of all streams. Output arrays are identical to the scalar
    decoder's (asserted in tests/test_jpeg_vectorized.py); a stream that
    trips ANY validation (invalid code, run overflow, truncated scan) is
    re-decoded scalar so it raises the exact scalar exception."""
    # Per-stream header parsing (ADVICE r14): one malformed header (e.g. a
    # progressive or multi-component JPEG) must not abort the whole batch
    # while scan-level errors get a per-stream scalar fallback. A stream
    # whose header fails to parse takes the same scalar re-decode path —
    # the batch is re-run on the parseable subset and the scalar decoder
    # reproduces the exact per-stream exception for the rest.
    metas = []
    for d in datas:
        try:
            metas.append(_parse_jpeg(bytes(d)))
        except Exception:
            metas.append(None)
    if any(m is None for m in metas):
        ok = [i for i, m in enumerate(metas) if m is not None]
        sub = iter(jpeg_decode_gray_many([datas[i] for i in ok]) if ok else [])
        return [
            next(sub) if m is not None else jpeg_decode_gray(bytes(datas[i]))
            for i, m in enumerate(metas)
        ]
    S = len(metas)
    if S == 0:
        return []

    lut_idx: dict[bytes, int] = {}
    luts: list[np.ndarray] = []

    def tab(key: bytes) -> int:
        if key not in lut_idx:
            lut_idx[key] = len(luts)
            luts.append(_lut_cached(key))
        return lut_idx[key]

    dtab = np.array([tab(m[3]) for m in metas], dtype=np.int64)
    atab = np.array([tab(m[4]) for m in metas], dtype=np.int64)
    lutflat = np.concatenate(luts).astype(np.int64)  # (T*65536,)

    chunks: list[bytes] = []
    base = np.zeros(S, dtype=np.int64)
    realend = np.zeros(S, dtype=np.int64)
    off = 0
    for s, m in enumerate(metas):
        scan = m[5]
        base[s] = off * 8
        realend[s] = off * 8 + 8 * len(scan)
        chunks.append(scan)
        chunks.append(b"\x00\x00\x00")  # peek16 runway past each stream end
        off += len(scan) + 3
    buf = np.frombuffer(b"".join(chunks) + b"\x00\x00\x00\x00", dtype=np.uint8).astype(np.int64)

    def peek16(p: np.ndarray) -> np.ndarray:
        # Bits [p, p+16) live in the 3 bytes from p>>3 (bit offset <= 7).
        bi = p >> 3
        sh = p & 7
        w24 = (buf[bi] << 16) | (buf[bi + 1] << 8) | buf[bi + 2]
        return (w24 >> (8 - sh)) & 0xFFFF

    def extend_v(amp: np.ndarray, size: np.ndarray) -> np.ndarray:
        half = np.int64(1) << (np.maximum(size, 1) - 1)
        return np.where(amp >= half, amp, amp - 2 * half + 1)

    hs = np.array([m[0] for m in metas], dtype=np.int64)
    ws = np.array([m[1] for m in metas], dtype=np.int64)
    bhs = -(-hs // 8)
    bws = -(-ws // 8)
    nblk = bhs * bws
    blk_base = np.concatenate(([0], np.cumsum(nblk)[:-1]))
    total_blocks = int(nblk.sum())

    # Coefficients land in NATURAL (row-major) order directly — the
    # per-write `_ZIGZAG[i]` gather is free compared to permuting the whole
    # (total_blocks, 64) matrix afterwards. has_ac tracks blocks with any
    # nonzero AC so the DC-only majority can skip the IDCT GEMM entirely.
    # int64, matching the scalar decoder (ADVICE r14): a corrupt-but-
    # header-valid stream whose accumulated DC predictor leaves int32
    # range must diverge loudly (scalar fallback), never wrap silently.
    coeff = np.zeros((total_blocks, 64), dtype=np.int64)
    has_ac = np.zeros(total_blocks, dtype=bool)
    pos = base.copy()
    blk = np.zeros(S, dtype=np.int64)
    ci = np.zeros(S, dtype=np.int64)  # next zigzag coefficient index
    ctx = np.zeros(S, dtype=np.int64)  # 0 = expect DC, 1 = expect AC
    prevdc = np.zeros(S, dtype=np.int64)
    done = nblk == 0  # degenerate zero-dim SOF streams decode to empty images
    failed = np.zeros(S, dtype=bool)

    def finish_blocks(g: np.ndarray) -> None:
        blk[g] += 1
        ci[g] = 0
        ctx[g] = 0
        done[g[blk[g] == nblk[g]]] = True

    act = np.flatnonzero(~done)
    while act.size:
        p = pos[act]
        pk = peek16(p)
        tabi = np.where(ctx[act] == 0, dtab[act], atab[act])
        ent = lutflat[tabi * 65536 + pk]
        ln = ent >> 8
        sym = ent & 0xFF
        p2 = p + ln
        bad = (ln == 0) | (p2 > realend[act])
        if bad.any():
            failed[act[bad]] = True
            ok = ~bad
            act, sym, p2 = act[ok], sym[ok], p2[ok]

        isdc = ctx[act] == 0
        gd, sd, pd = act[isdc], sym[isdc], p2[isdc]
        if gd.size:
            big = sd > 15  # DC size beyond 16-bit peek: defer to the scalar path
            if big.any():
                failed[gd[big]] = True
                keep = ~big
                gd, sd, pd = gd[keep], sd[keep], pd[keep]
            pk2 = peek16(pd)
            amp = np.where(sd > 0, pk2 >> (16 - sd), 0)
            v = np.where(sd == 0, 0, extend_v(amp, sd))
            prevdc[gd] += v
            coeff[blk_base[gd] + blk[gd], 0] = prevdc[gd]
            pos[gd] = pd + sd
            ci[gd] = 1
            ctx[gd] = 1
            over = pos[gd] > realend[gd]
            if over.any():
                failed[gd[over]] = True

        ga, sa, pa = act[~isdc], sym[~isdc], p2[~isdc]
        if ga.size:
            eob = sa == 0
            g_eob = ga[eob]
            pos[g_eob] = pa[eob]
            finish_blocks(g_eob)

            run = sa >> 4
            size = sa & 15
            size0 = (~eob) & (size == 0)
            badz = size0 & (run != 15)
            if badz.any():
                failed[ga[badz]] = True
            zrl = size0 & (run == 15)
            g_zrl = ga[zrl]
            if g_zrl.size:
                ci[g_zrl] += 16
                pos[g_zrl] = pa[zrl]
                fz = g_zrl[ci[g_zrl] >= 64]
                finish_blocks(fz)

            norm = (~eob) & (size > 0)
            gn, pn = ga[norm], pa[norm]
            if gn.size:
                sz = size[norm]
                i2 = ci[gn] + run[norm]
                over = i2 >= 64
                if over.any():
                    failed[gn[over]] = True
                    keep = ~over
                    gn, pn, sz, i2 = gn[keep], pn[keep], sz[keep], i2[keep]
                amp = peek16(pn) >> (16 - sz)
                gblk = blk_base[gn] + blk[gn]
                coeff[gblk, _ZIGZAG[i2]] = extend_v(amp, sz)
                has_ac[gblk] = True
                ci[gn] = i2 + 1
                pos[gn] = pn + sz
                overe = pos[gn] > realend[gn]
                if overe.any():
                    failed[gn[overe]] = True
                finish_blocks(gn[(ci[gn] >= 64) & ~overe])

        act = np.flatnonzero(~done & ~failed)

    # Dequantize + IDCT. DC-only blocks (the vast majority under coarse
    # quantization) shortcut the GEMM: with exactly one nonzero flat
    # coefficient, the GEMM row is F00 * _IDCT64[0] bit-exactly (the other
    # 63 products are exact zeros, and x + 0.0 == x in IEEE under ANY
    # summation order), so the pixel row comes from a per-unique-DC table
    # gather with no float64 temporaries. Blocks with AC energy run the
    # flattened (n, 64) @ (64, 64) GEMM, chunked to bound the working set.
    qblk = np.repeat(np.arange(S, dtype=np.int64), nblk)
    Qflat = np.stack([m[2].reshape(64) for m in metas]).astype(np.float64)
    blocks = np.empty((total_blocks, 8, 8), dtype=np.uint8)

    dcb = np.flatnonzero(~has_ac)
    if dcb.size:
        f00 = coeff[dcb, 0].astype(np.float64) * Qflat[qblk[dcb], 0]
        vals, inv = np.unique(f00, return_inverse=True)
        table = np.clip(
            np.rint(np.outer(vals, _IDCT64[0]) + 128.0), 0, 255
        ).astype(np.uint8)
        blocks[dcb] = table[inv].reshape(-1, 8, 8)

    acb = np.flatnonzero(has_ac)
    step = 1 << 18
    for lo in range(0, acb.size, step):
        sel = acb[lo : lo + step]
        F = coeff[sel].astype(np.float64) * Qflat[qblk[sel]]
        f = (F @ _IDCT64).reshape(-1, 8, 8)
        blocks[sel] = np.clip(np.rint(f + 128.0), 0, 255).astype(np.uint8)

    out: list[np.ndarray] = []
    for s in range(S):
        if failed[s]:
            # Reproduce the scalar decoder's exact exception (or, if the
            # scalar path somehow succeeds, trust its result).
            out.append(jpeg_decode_gray(bytes(datas[s])))
            continue
        b0 = int(blk_base[s])
        bh, bw_ = int(bhs[s]), int(bws[s])
        img = (
            blocks[b0 : b0 + bh * bw_]
            .reshape(bh, bw_, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw_ * 8)
        )
        out.append(img[: int(hs[s]), : int(ws[s])])
    return out
