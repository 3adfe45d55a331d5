"""Pure-stdlib PNG codec (zlib inflate/deflate + scanline (un)filtering).

The real-codec half of the multimodal boundary
(operators/multimodal.py): the container ships no PIL/ffmpeg, but PNG
needs nothing beyond ``zlib`` + ``struct`` — so the image leg of the
pipeline can run a REAL decode end-to-end instead of the deterministic
fake (round-5 verdict item 5).  Implemented from the public PNG
specification (RFC 2083 / W3C PNG): 8-byte signature, length-tagged
chunks with CRC32, IDAT = zlib-compressed scanlines each prefixed by a
filter-type byte (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth).

Scope: bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), no interlacing — the subset a synthetic-fixture pipeline
produces.  Palette (type 3), 16-bit, and Adam7 raise
``NotImplementedError`` with the exact unsupported field, so a foreign
corpus fails loudly, never garbles.

Per-pixel work here is Python-speed — fine for fixture-scale tests and
for proving the mapInPandas plumbing end-to-end; a production cluster
swaps this module for a vectorized codec behind the same two functions.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """RGB/RGBA/gray uint8 array (h, w[, ch]) → PNG bytes.

    ``filter_type`` applies one filter to every scanline (0–4) — the
    encoder's job is fixture generation, so exercising each decoder
    unfilter path matters more than compression ratio.
    """
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch  # bytes per pixel at bit depth 8
    raw = bytearray()
    prior = bytes(w * ch)
    for y in range(h):
        line = px[y].tobytes()
        raw.append(filter_type)
        if filter_type == 0:
            raw += line
        else:
            for x in range(len(line)):
                a = line[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                if filter_type == 1:
                    pred = a
                elif filter_type == 2:
                    pred = b
                elif filter_type == 3:
                    pred = (a + b) // 2
                else:  # 4 = Paeth
                    pred = _paeth(a, b, c)
                raw.append((line[x] - pred) & 0xFF)
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w, channels).  Validates the
    signature and every chunk CRC; inflates IDAT; reverses scanline
    filters 0–4."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos, idat, ihdr = 8, bytearray(), None
    while pos < len(data):
        if pos + 12 > len(data):
            raise ValueError("PNG stream truncated mid-chunk")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError(f"PNG chunk {tag!r}: truncated body")
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        if tag == b"IHDR":
            if len(body) != 13:
                raise ValueError("PNG IHDR must be 13 bytes")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} unsupported (only 8)")
    if color_type not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {color_type} unsupported")
    if interlace != 0:
        raise NotImplementedError("interlaced (Adam7) PNG unsupported")
    ch = _CHANNELS[color_type]
    bpp, stride = ch, w * ch
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length does not match dimensions")
    out = bytearray(h * stride)
    prior = bytes(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prior[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + (a + prior[x]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                c = prior[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(a, prior[x], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"PNG scanline filter {f} invalid")
        out[y * stride : (y + 1) * stride] = line
        prior = bytes(line)
    return np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, ch)
