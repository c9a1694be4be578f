"""Dependency-free baseline JPEG codec (ITU-T T.81 sequential DCT,
Huffman, 8-bit) — closes the last faked image format in the C5
multimodal path (VERDICT r5 #5). Pure ``struct``/numpy, mirroring the
r5 PNG work: no PIL/libjpeg in this container, so the container
parsing, entropy coding and transform are implemented directly.

Decoder: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/RSTn/EOI; grayscale and
3-component YCbCr, any sampling factors (box upsample); byte
de-stuffing and restart-interval DC prediction resets. Progressive
(SOF2), arithmetic coding, 12-bit precision and hierarchical modes
raise ``NotImplementedError`` — the ``_decode_image`` dispatch keeps
its deterministic-fake fallback for those only.

Encoder: grayscale or RGB 4:4:4 with the Annex K example tables
(quality-scaled, the same scaling IJG popularized) or caller-supplied
quantization tables. Used by fixtures/tests; the driver query's JPEG
arm uses an all-8 luminance table so block-constant fixtures survive
the DCT EXACTLY (a constant 8x8 block has only a DC coefficient;
DC = 8*(v-128) is divisible by Q=8, and the DC-only IDCT is a power-
of-two rescale — bit-exact through float), keeping the decode output
closed-form recomputable by a SQL oracle.

Exactness note: for general images JPEG is lossy (quantization); the
round-trip tests assert PSNR floors, while the block-constant path
asserts equality.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — the public example tables)
# --------------------------------------------------------------------------
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# (bits, values) per Annex K: bits[i] = #codes of length i+1
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
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
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Orthonormal 8x8 DCT-II matrix: FDCT S = 2*C·s·C^T scaled per T.81.
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _cu = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-serial decoder."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, values).items()}


# --------------------------------------------------------------------------
# Bit I/O
# --------------------------------------------------------------------------
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Bit-serial reader over an entropy-coded segment with de-stuffing
    and restart-marker awareness."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _next_byte(self) -> int:
        d, p = self.data, self.pos
        if p >= len(d):
            raise ValueError("truncated JPEG scan")
        b = d[p]
        if b == 0xFF:
            m = d[p + 1] if p + 1 < len(d) else 0xD9
            if m == 0x00:  # stuffed 0xFF data byte
                self.pos = p + 2
                return 0xFF
            raise _MarkerReached(m)
        self.pos = p + 1
        return b

    def read_bit(self) -> int:
        if self._n == 0:
            self._acc = self._next_byte()
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def reset(self) -> None:
        """Byte-align and consume a restart marker."""
        self._n = 0
        d, p = self.data, self.pos
        if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            self.pos = p + 2

    def huff_decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")


class _MarkerReached(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t low bits to the signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------
def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    s = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    coef = np.round(s / q).astype(np.int64)
    zz = coef.reshape(-1)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            if run == 16:
                zcode, zlen = ac_codes[0xF0]  # ZRL
                bw.write(zcode, zlen)
                run = 0
            continue
        t = _category(v)
        acode, alen = ac_codes[(run << 4) | t]
        bw.write(acode, alen)
        bw.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if last_nz < 63:
        ecode, elen = ac_codes[0x00]  # EOB
        bw.write(ecode, elen)
    return dc


def _dht_segment(tc_th: int, bits: list[int], values: list[int]) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, q: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(x) for x in q.reshape(-1)[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _pad_edge(pl, th: int, tw: int):
    h, w = pl.shape
    p = np.empty((th, tw))
    p[:h, :w] = pl
    if th > h:
        p[h:, :w] = pl[h - 1 : h, :]
    if tw > w:
        p[:, w:] = p[:, w - 1 : w]
    return np.clip(np.round(p), 0, 255)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    quant_lum: np.ndarray | None = None,
    restart_interval: int = 0,
    subsample: bool = False,
) -> bytes:
    """HxW uint8 (grayscale, 1 component) or HxWx3 uint8 RGB (YCbCr)
    → baseline JFIF bytes with the Annex K Huffman tables.
    ``quant_lum`` overrides the luminance quantization table (fixture
    exactness: all-8 keeps block-constant images lossless);
    ``restart_interval`` emits DRI + RSTn markers every N MCUs;
    ``subsample`` switches color output from 4:4:4 to 4:2:0 (2x2
    box-averaged chroma, 16x16 MCUs) — tests use both to exercise the
    decoder's restart and chroma-upsampling paths on real streams."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qlum = np.asarray(quant_lum, dtype=np.int32) if quant_lum is not None else _scale_quant(QUANT_LUM, quality)
    qch = _scale_quant(QUANT_CHROM, quality)
    if gray:
        planes = [arr.astype(np.float64)]
        qs, ncomp = [qlum], 1
        sampling = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qs, ncomp = [qlum, qch, qch], 3
        sampling = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for ci, pl in enumerate(planes):
        cs, vs = sampling[ci]
        ry, rx = vmax // vs, hmax // cs
        if ry > 1 or rx > 1:  # box-average downsample (pad to even first)
            pe = _pad_edge(
                pl,
                (pl.shape[0] + ry - 1) // ry * ry,
                (pl.shape[1] + rx - 1) // rx * rx,
            )
            pl = pe.reshape(pe.shape[0] // ry, ry, pe.shape[1] // rx, rx).mean(axis=(1, 3))
        padded.append(_pad_edge(pl, mcuy * 8 * vs, mcux * 8 * cs))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += _dqt_segment(0, qlum)
    if not gray:
        out += _dqt_segment(1, qch)
    comps = b"".join(
        bytes([cid + 1, (sampling[cid][0] << 4) | sampling[cid][1], 0 if cid == 0 else 1])
        for cid in range(ncomp)
    )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp) + comps
    dc0, ac0 = _canonical_codes(*DC_LUM), _canonical_codes(*AC_LUM)
    out += _dht_segment(0x00, *DC_LUM) + _dht_segment(0x10, *AC_LUM)
    tabs = [(dc0, ac0)]
    if not gray:
        dc1, ac1 = _canonical_codes(*DC_CHROM), _canonical_codes(*AC_CHROM)
        out += _dht_segment(0x01, *DC_CHROM) + _dht_segment(0x11, *AC_CHROM)
        tabs += [(dc1, ac1), (dc1, ac1)]
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos_comps = b"".join(
        bytes([cid + 1, 0x00 if cid == 0 else 0x11]) for cid in range(ncomp)
    )
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp) + sos_comps + b"\x00\x3f\x00"

    bw = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bw.out + bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            bw = _BitWriter()
            preds = [0] * ncomp
        for ci in range(ncomp):
            cs, vs = sampling[ci]
            for by in range(vs):
                for bx in range(cs):
                    y0 = (my * vs + by) * 8
                    x0 = (mx * cs + bx) * 8
                    block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                    preds[ci] = _encode_block(bw, block, qs[ci], preds[ci], *tabs[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------
def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → HxWx3 uint8 RGB (grayscale replicated).
    Raises ``NotImplementedError`` for progressive/arithmetic/12-bit
    streams and ``ValueError`` for malformed ones."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart = 0
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG (no SOS)")
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("EOI before scan")
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline JPEG frame (SOF{marker - 0xC0})")
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                off += 1
                if pq:
                    vals = np.frombuffer(body, dtype=">u2", count=64, offset=off).astype(np.int32)
                    off += 128
                else:
                    vals = np.frombuffer(body, dtype=np.uint8, count=64, offset=off).astype(np.int32)
                    off += 64
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = vals
                quant[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                values = list(body[off + 17 : off + 17 + n])
                huff[(tc, th)] = _decode_table(bits, values)
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = {}
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                sel[cs] = (tt >> 4, tt & 0xF)
            scan_pos = pos + seglen
            return _decode_scan(data, scan_pos, frame, quant, huff, sel, restart)
        # else: APPn/COM/unknown — skip
        pos += seglen


def _decode_scan(data, pos, frame, quant, huff, sel, restart) -> np.ndarray:
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in comps
    ]
    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            br.reset()
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        try:
            for ci, c in enumerate(comps):
                dct, act = sel[c["id"]]
                dc_tab, ac_tab = huff[(0, dct)], huff[(1, act)]
                q = quant[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = _decode_block(br, dc_tab, ac_tab, q, preds, ci)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
        except _MarkerReached as e:
            if e.marker == 0xD9 or 0xD0 <= e.marker <= 0xD7:
                break  # tolerated: truncated tail decodes what it has
            raise ValueError(f"unexpected marker 0x{e.marker:02x} in scan") from e
    # upsample to full MCU-aligned size, crop, color-convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(br, dc_tab, ac_tab, q, preds, ci) -> np.ndarray:
    t = br.huff_decode(dc_tab)
    diff = _extend(br.receive(t), t)
    preds[ci] += diff
    zz = np.zeros(64, dtype=np.int64)
    zz[0] = preds[ci]
    k = 1
    while k < 64:
        sym = br.huff_decode(ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0xF
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.receive(size), size)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[ZIGZAG] = zz * q.reshape(-1)[ZIGZAG]
    s = coef.reshape(8, 8)
    # _C is the orthonormal DCT-II matrix (and equals the T.81 FDCT:
    # S = C·s·C^T), so the exact inverse is s = C^T·S·C; a DC-only
    # block reduces to power-of-two rescales → bit-exact through float.
    return (_C.T @ s @ _C) + 128.0
