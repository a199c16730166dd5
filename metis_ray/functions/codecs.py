"""Pure-Python image/audio codecs (stdlib only): PNG and WAV.

The container has no PIL/libvips/ffmpeg, but the reference's ethos is "no
information lost" on REAL binary payloads (the typed payload parsers,
Metis/tools/STDFHelper.py:248-347) — so the multimodal pipeline's
``decoder='real'`` path needs an actual decoder, not a fake. PNG's byte
format is zlib (stdlib) + per-row filters, and WAV is stdlib ``wave`` —
both decodable without third-party libraries.

These are FALLBACK codecs: correct and tested against spec-constructed
payloads, fast enough for per-asset actor-pool stages, but a production
deployment with PIL/ffmpeg installed should swap them in via the same
``decoder=`` gate (`multimodal.DecodeAndFeaturize`). Scope: 8-bit
greyscale / grey+alpha / RGB / RGBA non-interlaced PNG (color types
0/2/4/6 — covers everything this engine re-encodes) and 8/16-bit PCM WAV.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}   # PNG color type -> samples/pixel


def sniff(payload: bytes) -> str | None:
    """Magic-byte format sniff: 'image/png', 'audio/wav', or None."""
    if payload[:8] == PNG_MAGIC:
        return "image/png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 array.

    Supports 8-bit depth, color types 0/2/4/6, non-interlaced — raises
    ``NotImplementedError`` for palette/16-bit/interlaced variants (use a
    real codec library for those)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = chunk
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    ch = _CHANNELS.get(color)
    if depth != 8 or ch is None or interlace != 0:
        raise NotImplementedError(
            f"pure-Python PNG fallback handles 8-bit color types 0/2/4/6 "
            f"non-interlaced only (got depth={depth} color={color} "
            f"interlace={interlace}); install PIL for full coverage")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has the wrong size")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(raw, np.uint8, stride,
                            y * (stride + 1) + 1).astype(np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 2:            # Up — fully vectorized
            cur = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):    # Sub/Average/Paeth: left-dependency
            cur = row
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                if ftype == 1:
                    cur[i] = (cur[i] + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (cur[i] + ((a + b) >> 1)) & 0xFF
                else:
                    cur[i] = (cur[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


def encode_png(img: np.ndarray) -> bytes:
    """(h, w) or (h, w, channels) uint8 array -> PNG bytes (filter 0)."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    rows = np.concatenate([np.zeros((h, 1), np.uint8),   # filter byte 0
                           a.reshape(h, w * ch)], axis=1).ravel()
    idat = zlib.compress(rows.tobytes(), 6)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n_frames, channels) int16 array, sample_rate).

    8-bit PCM is widened to int16 (offset-binary -> signed, <<8); 16-bit
    is zero-copy. Other widths raise ``NotImplementedError``."""
    with wave.open(io.BytesIO(data), "rb") as f:
        ch, sw, sr, n = (f.getnchannels(), f.getsampwidth(),
                         f.getframerate(), f.getnframes())
        frames = f.readframes(n)
    if sw == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.int16)
    elif sw == 1:
        arr = ((np.frombuffer(frames, np.uint8).astype(np.int16) - 128)
               << 8)
    else:
        raise NotImplementedError(
            f"pure-Python WAV fallback handles 8/16-bit PCM only "
            f"(got sampwidth={sw}); install soundfile for full coverage")
    return arr.reshape(-1, ch), sr


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames,) or (n_frames, channels) int16 array -> 16-bit PCM WAV."""
    a = np.ascontiguousarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(a.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(a.tobytes())
    return buf.getvalue()
