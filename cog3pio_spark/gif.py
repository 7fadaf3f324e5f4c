"""GIF decoder in pure Python/numpy (fifth real in-repo media codec).

GIF's LZW differs from the TIFF variant the repo already ships (LSB-first
bit packing, per-image variable initial code size, clear/EOI codes, width
growth WITHOUT TIFF's early change) — an independent implementation, not a
reuse, validated the same way: GIF is lossless for ≤256-color frames, so
the interop contract against Java ImageIO is EXACT per-pixel equality
(tests/test_gif.py).

Supported: GIF87a/89a, global and local color tables, interlaced images
(pass reordering), extensions skipped; the FIRST frame of animated GIFs is
decoded and composited onto the logical screen (r5: sub-rectangle first
frames — partial updates — are placed at their descriptor offsets over the
background color instead of being returned mispositioned).
Performance note: the LZW loop is per-code Python — correctness-first
reference decoder (same contract note as jpeg.py/png.py).
"""

from __future__ import annotations

import struct

import numpy as np


class GifDecodeError(ValueError):
    """Parse/decode failure with an honest message."""


def _lzw_decode_gif(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: LSB-first packing, clear/EOI, 12-bit max codes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), bitorder="little")
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None

    def read_code() -> int:
        nonlocal pos
        if pos + width > len(bits):
            return eoi  # truncated stream: stop (caller length-checks)
        chunk = bits[pos : pos + width]
        pos += width
        v = 0
        for i in range(width - 1, -1, -1):
            v = (v << 1) | int(chunk[i])
        return v

    while len(out) < n_pixels:
        code = read_code()
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise GifDecodeError("Cannot decode GIF: bad initial LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifDecodeError("Cannot decode GIF: LZW code out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise GifDecodeError(
            f"Cannot decode GIF: expected {n_pixels} pixels, got {len(out)}"
        )
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace: rows 0::8, 4::8, 2::4, 1::2."""
    h = idx.shape[0]
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode_gif(raw: bytes) -> np.ndarray:
    """Decode the first frame of a GIF to a (3, h, w) uint8 RGB tensor.

    Every failure surfaces as :class:`GifDecodeError` — truncated headers,
    short color tables, and malformed LZW parameters raise struct/numpy
    errors internally, wrapped here so the documented taxonomy holds for
    direct callers too (r3 review: struct.error is not even a ValueError)."""
    try:
        return _decode_gif(raw)
    except GifDecodeError:
        raise
    except (
        struct.error, ValueError, IndexError, KeyError, ZeroDivisionError,
        OverflowError,
    ) as exc:
        raise GifDecodeError(f"Cannot parse GIF: truncated or corrupt ({exc})") from exc


def _decode_gif(raw: bytes) -> np.ndarray:
    if len(raw) < 13 or raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifDecodeError("Cannot parse GIF: bad signature")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", raw, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(raw[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n

    while pos < len(raw):
        block = raw[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(raw) and raw[pos] != 0:
                pos += 1 + raw[pos]
            pos += 1  # terminator
        elif block == 0x2C:  # image descriptor — decode this (first) frame
            ix, iy, iw, ih, ipacked = struct.unpack_from("<HHHHB", raw, pos)
            pos += 9
            ct = gct
            if ipacked & 0x80:  # local color table
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(raw[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
                pos += 3 * n
            if ct is None:
                raise GifDecodeError("Cannot parse GIF: no color table")
            min_code_size = raw[pos]
            pos += 1
            data = bytearray()
            while pos < len(raw) and raw[pos] != 0:
                ln = raw[pos]
                data.extend(raw[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = _lzw_decode_gif(bytes(data), min_code_size, iw * ih).reshape(ih, iw)
            if ipacked & 0x40:
                idx = _deinterlace(idx)
            if int(idx.max(initial=0)) >= len(ct):
                raise GifDecodeError(
                    f"Cannot decode GIF: color index {int(idx.max())} out of "
                    f"range for {len(ct)}-entry table"
                )
            rgb = ct[idx]  # (h, w, 3)
            # r5 review: the descriptor's offsets were discarded — a first
            # frame covering a sub-rectangle (common when frame 1 is a
            # partial update) came back mispositioned with the wrong
            # dimensions. Composite onto the sw×sh logical screen filled
            # with the background color (GCT[bg]; black without a GCT —
            # there is no on-screen prior for frame 1).
            if (ix, iy, iw, ih) != (0, 0, sw, sh):
                if ix + iw > sw or iy + ih > sh:
                    raise GifDecodeError(
                        f"Cannot decode GIF: frame rect ({ix},{iy})+"
                        f"{iw}x{ih} exceeds logical screen {sw}x{sh}"
                    )
                bg_rgb = (
                    gct[_bg] if gct is not None and _bg < len(gct)
                    else np.zeros(3, np.uint8)
                )
                canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
                canvas[iy : iy + ih, ix : ix + iw] = rgb
                rgb = canvas
            return np.moveaxis(rgb, -1, 0).copy()
        elif block == 0x3B:  # trailer
            break
        else:
            raise GifDecodeError(f"Cannot parse GIF: unknown block 0x{block:02x}")
    raise GifDecodeError("Cannot parse GIF: no image data")
