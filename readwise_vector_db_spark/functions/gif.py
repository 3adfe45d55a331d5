"""Pure-stdlib animated-GIF codec (LZW + frame compositing) — the video
leg of the multimodal codec boundary (operators/multimodal.py).

The container ships no ffmpeg/PIL, but GIF needs nothing beyond bit
twiddling: a GIF89a stream is a logical-screen descriptor, color
tables, and a sequence of LZW-compressed image frames with per-frame
delays — a real multi-frame video container every public tool reads.
Implemented from the public GIF89a specification (CompuServe, 1990).

Scope: global and local color tables, multiple frames with partial-rect
placement, disposal methods 0/1 (leave) and 2 (restore to background),
transparency (transparent pixels keep the previous canvas content),
87a and 89a signatures.  Interlaced frames and disposal 3 (restore
previous) raise ``NotImplementedError`` with the exact unsupported
field — a foreign corpus fails loudly, never garbles — the same
contract as the PNG/WAV codecs.

LZW notes (the fiddly part): codes are packed LSB-first; the decoder's
string table lags the encoder's by one entry, so the two sides widen
their code size at different-looking local conditions that land
between the same two codes of the stream — the classic off-by-one
that, done wrong, desynchronizes exactly at the 16/512/1024/2048 code
boundaries (the width-bump tests pin them).  A full table (4095) emits a clear code and resets.  The
known-good 1-byte-payload 1×1 GIF from public web documentation is
pinned in tests as external ground truth.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 0xFFF  # 12-bit LZW ceiling per the GIF spec


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    buf = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    w = b""
    for k in indices.tobytes():
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code <= _MAX_CODE:
            table[wk] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([k])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    buf = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            buf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = buf & ((1 << code_size) - 1)
        buf >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        out += entry
        if prev is not None and len(table) <= _MAX_CODE:
            table.append(prev + entry[:1])
            # the decoder's table lags the encoder's by one entry (the
            # encoder inserts on every emission, the decoder only from
            # the second received code), so the decoder widens when its
            # table REACHES the width limit while the encoder widens
            # when its next_code passes it — net: both switch exactly
            # between the same two codes of the stream
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF frame data shorter than its dimensions")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        piece = data[i : i + 255]
        out.append(len(piece))
        out += piece
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: np.ndarray, delays_ms: list[int] | None = None
) -> bytes:
    """(n, h, w, 3) uint8 frames → animated GIF89a bytes with one global
    color table (≤256 distinct colors across all frames — raise
    otherwise; the encoder's job is fixture generation), full-frame
    images, per-frame delays in ms (centisecond resolution)."""
    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim == 3:
        fr = fr[None]
    if fr.ndim != 4 or fr.shape[-1] != 3:
        raise ValueError(f"frames must be (n, h, w, 3), got {fr.shape}")
    n, h, w, _ = fr.shape
    flat = fr.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF encoder: {len(palette)} distinct colors > 256")
    bits = max(1, int(len(palette) - 1).bit_length())
    table_size = 1 << bits
    pal_bytes = palette.tobytes() + b"\x00" * (3 * (table_size - len(palette)))
    idx = inverse.astype(np.uint8).reshape(n, h, w)
    min_code_size = max(2, bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal_bytes
    delays = delays_ms or [100] * n
    for f in range(n):
        delay_cs = max(0, int(delays[f] if f < len(delays) else delays[-1]) // 10)
        out += b"\x21\xf9" + struct.pack("<BBHBB", 4, 0x04, delay_cs, 0, 0)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code_size)
        out += _sub_blocks(_lzw_encode(idx[f].ravel(), min_code_size))
    out += b"\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> tuple[np.ndarray, list[int]]:
    """Animated GIF bytes → ((n, h, w, 3) uint8 composited frames,
    per-frame delays in ms).  Frames are composited onto the logical
    screen per the spec: partial rects draw over the canvas, transparent
    pixels keep previous content, disposal 2 restores the background
    color after the frame."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    try:
        return _decode_gif_checked(data)
    except (IndexError, struct.error) as e:
        # out-of-bounds reads on a syntactically broken stream surface
        # as the same loud typed error as every other reject
        raise ValueError(f"GIF stream truncated or malformed: {e}") from e


def _decode_gif_checked(data: bytes) -> tuple[np.ndarray, list[int]]:
    w, h, packed, bg_idx, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    global_pal = None
    if packed & 0x80:
        size = 1 << ((packed & 0x07) + 1)
        global_pal = np.frombuffer(data[pos : pos + 3 * size], dtype=np.uint8).reshape(
            -1, 3
        )
        pos += 3 * size
    bg_rgb = (
        global_pal[bg_idx] if global_pal is not None and bg_idx < len(global_pal)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.tile(bg_rgb, (h, w, 1)).astype(np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay_ms = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                flags, delay_cs, tidx = struct.unpack(
                    "<BHB", data[pos + 1 : pos + 5]
                )
                disposal = (flags >> 2) & 0x07
                transparent = tidx if flags & 0x01 else None
                delay_ms = delay_cs * 10
                pos += 1 + size
            while data[pos] != 0:  # skip (remaining) sub-blocks
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF block 0x{block:02x} unsupported")
        fx, fy, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if fpacked & 0x40:
            raise NotImplementedError("interlaced GIF frame unsupported")
        if disposal == 3:
            raise NotImplementedError("GIF disposal method 3 unsupported")
        pal = global_pal
        if fpacked & 0x80:
            size = 1 << ((fpacked & 0x07) + 1)
            pal = np.frombuffer(data[pos : pos + 3 * size], dtype=np.uint8).reshape(
                -1, 3
            )
            pos += 3 * size
        if pal is None:
            raise ValueError("GIF frame has no color table")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            cnt = data[pos]
            lzw += data[pos + 1 : pos + 1 + cnt]
            pos += 1 + cnt
        pos += 1
        idx = _lzw_decode(bytes(lzw), min_code_size, fw * fh).reshape(fh, fw)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("GIF pixel index outside color table")
        region = canvas[fy : fy + fh, fx : fx + fw]
        rgb = pal[idx]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            rgb = np.where(mask, rgb, region)
        canvas[fy : fy + fh, fx : fx + fw] = rgb
        frames.append(canvas.copy())
        delays.append(delay_ms)
        if disposal == 2:
            canvas[fy : fy + fh, fx : fx + fw] = bg_rgb
        transparent = None
        disposal = 0
        delay_ms = 0
    if not frames:
        raise ValueError("GIF contains no image frames")
    return np.stack(frames), delays


def video_features(
    frames: np.ndarray, delays_ms: list[int], dim: int = 16
) -> np.ndarray:
    """Deterministic real feature vector from decoded video — the video
    analogue of ``pixel_features``/``audio_features``: [n_frames,
    duration_s, mean intensity/255, mean |frame-to-frame delta|/255]
    + a ``dim-4``-bin intensity histogram over all frames' pixels."""
    fr = np.asarray(frames, dtype=np.float32)
    n = fr.shape[0]
    intensity = fr.mean(axis=-1)
    motion = (
        float(np.abs(np.diff(intensity, axis=0)).mean()) / 255.0 if n > 1 else 0.0
    )
    hist, _ = np.histogram(intensity, bins=dim - 4, range=(0.0, 256.0))
    hist = hist / max(1, intensity.size)
    head = [
        float(n),
        sum(delays_ms) / 1000.0,
        float(intensity.mean()) / 255.0,
        motion,
    ]
    return np.asarray(head + hist.tolist(), dtype=np.float32)
