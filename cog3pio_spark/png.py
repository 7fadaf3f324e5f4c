"""PNG decoder in pure Python/numpy (zlib + scanline filters, no codec libs).

Fourth real in-repo media codec (TIFF, WAV, baseline JPEG, PNG). PNG is
LOSSLESS, so the interop contract against the second implementation (Java
ImageIO via the Spark JVM) is EXACT per-pixel equality — stronger than the
JPEG ±2 tolerance (tests/test_png.py).

Supported: 8-bit and 16-bit gray / gray+alpha / RGB / RGBA and 1/2/4/8-bit
palette, all five scanline filters (None/Sub/Up/Average/Paeth), multiple
IDAT chunks. Adam7 interlace raises an honest ``unsupported error``
(virtually all machine-generated PNGs are non-interlaced).

Performance note (honest): Sub/Average/Paeth unfiltering carries a
left-to-right data dependency, implemented as a per-byte Python loop per
scanline — a correctness-first reference decoder (same contract note as
jpeg.py); Up/None rows are fully vectorized.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class PngDecodeError(ValueError):
    """Parse/decode failure with an honest message."""


_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering. ``raw`` is (height, 1+stride) bytes
    (filter byte + data); returns (height, stride) recon bytes."""
    recon = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = recon[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            out = line
        elif ftype == 2:  # Up
            out = (line + prev) & 0xFF
        elif ftype == 1:  # Sub (left dependency: sequential)
            out = line.copy()
            for i in range(bpp, stride):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        elif ftype == 3:  # Average
            out = line.copy()
            for i in range(stride):
                left = out[i - bpp] if i >= bpp else 0
                out[i] = (out[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            out = line.copy()
            for i in range(stride):
                a = out[i - bpp] if i >= bpp else 0  # left
                b = prev[i]  # up
                c = prev[i - bpp] if i >= bpp else 0  # up-left
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[i] = (out[i] + pred) & 0xFF
        else:
            raise PngDecodeError(f"Cannot decode PNG: unknown filter type {ftype}")
        recon[y] = out.astype(np.uint8)
    return recon


def decode_png(raw: bytes) -> np.ndarray:
    """Decode a PNG byte stream to a (bands, h, w) uint8/uint16 tensor
    (bands: 1 gray, 2 gray+alpha, 3 RGB, 4 RGBA; palette expands to RGB).

    Every failure surfaces as :class:`PngDecodeError` (r4: struct/index/
    zlib errors from truncated chunks wrapped here, same contract as
    decode_gif/decode_jpeg)."""
    try:
        return _decode_png_stream(raw)
    except PngDecodeError:
        raise
    except (struct.error, ValueError, IndexError, ZeroDivisionError, KeyError, zlib.error) as exc:
        raise PngDecodeError(
            f"Cannot parse PNG: truncated or corrupt ({type(exc).__name__})"
        ) from exc


def _decode_png_stream(raw: bytes) -> np.ndarray:
    if len(raw) < 8 or raw[:8] != _SIG:
        raise PngDecodeError("Cannot parse PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(raw):
        length, ctype = struct.unpack_from(">I4s", raw, pos)
        body = raw[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if comp != 0 or filt != 0:
                raise PngDecodeError("Cannot parse PNG: unknown compression/filter method")
            if interlace == 1:
                raise PngDecodeError(
                    "unsupported error: Adam7 interlaced PNG is unsupported"
                )
            if color not in _CHANNELS:
                raise PngDecodeError(f"Cannot parse PNG: bad color type {color}")
            if color == 3 and depth not in (1, 2, 4, 8):
                raise PngDecodeError(f"Cannot parse PNG: bad palette depth {depth}")
            if color != 3 and depth not in (8, 16):
                raise PngDecodeError(
                    f"unsupported error: {depth}-bit color type {color} is unsupported"
                )
            ihdr = (w, h, depth, color)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise PngDecodeError("Cannot parse PNG: missing IHDR/IDAT")
    w, h, depth, color = ihdr
    channels = _CHANNELS[color]
    bits_per_px = depth * channels
    stride = (w * bits_per_px + 7) // 8
    bpp = max(1, bits_per_px // 8)  # filter unit in bytes

    try:
        data = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise PngDecodeError(f"Cannot decode PNG: corrupt IDAT ({exc})") from exc
    if len(data) != h * (stride + 1):
        raise PngDecodeError(
            f"Cannot decode PNG: expected {h * (stride + 1)} filtered bytes, "
            f"got {len(data)}"
        )
    recon = _unfilter(
        np.frombuffer(data, dtype=np.uint8).reshape(h, stride + 1), h, stride, bpp
    )

    if color == 3:  # palette: unpack indices, expand via PLTE
        if palette is None:
            raise PngDecodeError("Cannot parse PNG: palette image without PLTE")
        if depth == 8:
            idx = recon[:, :w]
        else:  # 1/2/4-bit packed indices, MSB first
            bits = np.unpackbits(recon, axis=1)
            idx = np.zeros((h, w), dtype=np.uint8)
            for k in range(depth):
                idx = (idx << 1) | bits[:, k::depth][:, :w]
        if int(idx.max(initial=0)) >= len(palette):
            raise PngDecodeError(
                f"Cannot decode PNG: palette index {int(idx.max())} out of "
                f"range for {len(palette)}-entry PLTE"
            )
        rgb = palette[idx]  # (h, w, 3)
        return np.moveaxis(rgb, -1, 0).copy()

    if depth == 8:
        px = recon[:, : w * channels].reshape(h, w, channels)
    else:  # 16-bit big-endian samples (contiguous copy before the view)
        px = (
            np.ascontiguousarray(recon[:, : w * channels * 2])
            .view(">u2")
            .astype(np.uint16)
            .reshape(h, w, channels)
        )
    return np.moveaxis(px, -1, 0).copy()
