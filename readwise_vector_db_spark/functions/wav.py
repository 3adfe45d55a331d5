"""Pure-stdlib WAV (RIFF/PCM) codec — the audio leg of the multimodal
codec boundary (operators/multimodal.py).

The container ships no torchaudio/soundfile, but PCM WAV needs nothing
beyond ``struct``: a RIFF container holding an ``fmt `` chunk (format
tag, channel count, sample rate, bits per sample) and a ``data`` chunk
of interleaved little-endian samples.  Implemented from the public
RIFF/WAVE specification (Microsoft/IBM multimedia programming
interface, the format every public audio tool reads).

Scope: format tag 1 (integer PCM), 8-bit unsigned / 16-bit signed
samples, any channel count / sample rate.  Compressed formats
(float32 tag 3, A-law/µ-law, extensible tag 0xFFFE) raise
``NotImplementedError`` with the exact unsupported field, so a foreign
corpus fails loudly, never garbles — the same contract as the PNG
codec (functions/png.py).

Decoding is a single ``np.frombuffer`` over the data chunk — unlike
the per-pixel PNG unfiltering, WAV decode is vectorized even in this
stdlib implementation, so it is production-speed inside the Arrow
batches of ``mapInPandas``.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 8000, bits: int = 16) -> bytes:
    """float array in [-1, 1] of shape (n,) or (n, channels) → PCM WAV
    bytes (``bits`` = 8 unsigned or 16 signed).  Clips out-of-range
    input; the encoder's job is fixture generation."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError(f"samples must be (n,) or (n, ch), got shape {s.shape}")
    s = np.clip(s, -1.0, 1.0)
    if bits == 16:
        pcm = np.round(s * 32767.0).astype("<i2")
    elif bits == 8:
        pcm = np.round((s * 0.5 + 0.5) * 255.0).astype(np.uint8)
    else:
        raise NotImplementedError(f"WAV bits {bits} unsupported (only 8/16)")
    n, ch = s.shape
    block_align = ch * bits // 8
    data = pcm.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:  # RIFF chunks are word-aligned
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (samples float32 in [-1, 1] of shape
    (n, channels), sample_rate).  Loud rejects for anything outside the
    integer-PCM 8/16-bit scope."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, end = 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    fmt = None
    pcm = None
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"WAV chunk {tag!r}: truncated body")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            pcm = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("WAV missing fmt chunk")
    if pcm is None:
        raise ValueError("WAV missing data chunk")
    audio_format, ch, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(
            f"WAV format tag {audio_format} unsupported (only 1 = integer PCM)"
        )
    if ch < 1:
        raise ValueError("WAV channel count must be >= 1")
    if bits == 16:
        raw = np.frombuffer(pcm[: len(pcm) - len(pcm) % (2 * ch)], dtype="<i2")
        samples = raw.astype(np.float32) / 32767.0
    elif bits == 8:
        raw = np.frombuffer(pcm[: len(pcm) - len(pcm) % ch], dtype=np.uint8)
        samples = raw.astype(np.float32) / 255.0 * 2.0 - 1.0
    else:
        raise NotImplementedError(f"WAV bits {bits} unsupported (only 8/16)")
    return samples.reshape(-1, ch), rate


def audio_features(samples: np.ndarray, sample_rate: int, dim: int = 16) -> np.ndarray:
    """Deterministic real feature vector from decoded audio — the
    audio analogue of ``pixel_features``: [duration_s, rms, peak,
    zero-crossing rate] + a ``dim-4``-slice RMS energy profile over
    equal time slices (the toy-but-real stand-in for an audio embedding
    model at the same (samples → float[dim]) boundary)."""
    mono = np.asarray(samples, dtype=np.float32)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    n = mono.size
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.abs(mono).max())
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    n_slices = dim - 4
    edges = (np.arange(n_slices + 1) * n) // n_slices
    profile = [
        float(np.sqrt(np.mean(mono[a:b] ** 2))) if b > a else 0.0
        for a, b in zip(edges[:-1], edges[1:])
    ]
    return np.asarray(
        [n / sample_rate, rms, peak, zcr] + profile, dtype=np.float32
    )
