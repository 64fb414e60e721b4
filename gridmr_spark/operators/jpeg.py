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
    F = np.einsum("ux,bcxy,vy->bcuv", _DCT, f, _DCT)
    coeff = np.rint(F / Q[None, None]).astype(np.int64)
    zz = coeff.reshape(-1, 64)[:, _ZIGZAG]  # (n_blocks, 64) in zigzag order

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
                c, ln = ac_codes[0xF0]  # ZRL
                bw.write(c, ln)
                run -= 16
            s = _category(v)
            c, ln = ac_codes[(run << 4) | s]
            bw.write(c, ln)
            bw.write(_amplitude(v, s), s)
            run = 0
        if last < 63:
            c, ln = ac_codes[0x00]  # EOB
            bw.write(c, ln)
    scan = bw.flush()

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


def jpeg_decode_gray(data: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG to an (h, w) uint8 array. Supports
    what a single-component baseline stream needs: DQT (8-bit), SOF0 with
    one component, DHT, SOS without restart intervals; other APPn/COM
    segments are skipped by length."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
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
                vals = list(body[off + 17 : off + 17 + n])
                huff[(tc, th)] = _build_lut(bits, vals)
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

    br = _BitReader(_unstuff_scan(data, scan_start))
    bh, bw_ = -(-h // 8), -(-w // 8)
    Q = qtables[comp_q]
    dc_lut, ac_lut = huff[(0, dc_id)], huff[(1, ac_id)]
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
    f = np.einsum("xu,bxy,yv->buv", _DCT, F.astype(np.float64), _DCT)
    blocks = np.clip(np.rint(f + 128.0), 0, 255).astype(np.uint8)
    out = (
        blocks.reshape(bh, bw_, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw_ * 8)
    )
    return out[:h, :w]
