"""Dependency-free GIF89a codec — a REAL multi-frame video container
for the C5 video path (the BMP/PNG/JPEG story, applied to animation):
``struct``/numpy only, full LZW with dictionary build/reset and the
KwKwK case, so frame extraction runs on actual container bytes.

Scope: grayscale 256-entry global palette, no transparency, no
interlace, disposal "none", full-size frames — the subset our
deterministic fixtures need; the decoder additionally handles frames
with their own offsets/local palettes absent (it rejects interlaced
and locally-paletted streams loudly rather than decoding them wrong).
GIF is LOSSLESS, so decoded frames equal the encoder input exactly and
every downstream stat stays closed-form for a SQL oracle.
"""

from __future__ import annotations

import struct

import numpy as np

_CLEAR = 256
_EOI = 257


def _lzw_compress(indices: bytes, min_code: int = 8) -> bytes:
    """Variable-width LZW per the GIF spec: dictionary build, CLEAR on
    table overflow (max code 4095), little-endian bit packing."""
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << min_code)}
    next_code = _EOI + 1
    emit(_CLEAR)
    w = b""
    for ch in indices:
        wk = w + bytes([ch])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code <= 4095:
            table[wk] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(_CLEAR)
            table = {bytes([i]): i for i in range(1 << min_code)}
            next_code = _EOI + 1
            width = min_code + 1
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(_EOI)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, n_px: int, min_code: int = 8) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
    prev: bytes | None = None

    while len(out) < n_px:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == _CLEAR:
            table = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == _EOI:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("bad LZW code")
        out += entry
        if prev is not None and len(table) <= 4095:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    # A multi-byte table entry may cross the pixel-count boundary
    # (foreign encoders end streams mid-entry; self-encoded streams
    # always end exactly) — tolerate it by slicing to the frame size.
    return bytes(out[:n_px])


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    return bytes(out)


def encode_gif(frames: list[np.ndarray], delay_cs: int = 10) -> bytes:
    """List of HxW uint8 GRAYSCALE frames → animated GIF89a bytes
    (grayscale global palette, netscape loop, per-frame graphic
    control). Lossless: decode returns the exact arrays."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global palette, 8 bits, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):  # grayscale palette
        out += bytes([i, i, i])
    out += b"\x21\xff\x0bNETSCAPE2.0" + _sub_blocks_raw(b"\x01\x00\x00")
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must share dimensions")
        out += b"\x21\xf9" + bytes([4, 0]) + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # no local palette
        out += bytes([8])  # LZW min code size
        out += _sub_blocks(_lzw_compress(np.ascontiguousarray(fr, dtype=np.uint8).tobytes()))
    out += b"\x3b"  # trailer
    return bytes(out)


def _sub_blocks_raw(payload: bytes) -> bytes:
    return bytes([len(payload)]) + payload + b"\x00"


def decode_gif(data: bytes) -> list[np.ndarray]:
    """GIF87a/89a bytes → list of HxW uint8 frames (palette applied as
    grayscale index — our palette is the identity ramp; a non-grayscale
    global palette raises). Interlace and local palettes raise."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _, _ = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        pal = np.frombuffer(data, dtype=np.uint8, count=n * 3, offset=pos).reshape(n, 3)
        if not (pal[:, 0] == pal[:, 1]).all() or not (pal[:, 1] == pal[:, 2]).all():
            raise ValueError("non-grayscale global palette unsupported")
        ramp = pal[:, 0]
        pos += n * 3
    else:
        raise ValueError("GIF without a global palette unsupported")
    frames: list[np.ndarray] = []
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        fx, fy, fw, fh, fflags = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        if fflags & 0x80:
            raise ValueError("local palettes unsupported")
        if fflags & 0x40:
            raise ValueError("interlaced GIF unsupported")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            n = data[pos]
            lzw += data[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1
        idx = _lzw_decompress(bytes(lzw), fw * fh, min_code)
        frame = np.full((h, w), 0, dtype=np.uint8)
        frame[fy : fy + fh, fx : fx + fw] = ramp[
            np.frombuffer(idx, dtype=np.uint8).reshape(fh, fw)
        ]
        frames.append(frame)
    return frames
