"""Deterministic corruption fuzz over the real codec decoders (r5).

The r4 corrupt-input regression test drives four hand-crafted crashing
blobs; this sweep goes wider: seeded random byte flips and truncations of
every committed media fixture must yield either a successful decode (a
flip in pixel data is often survivable) or the codec's OWN typed error —
never a bare crash class (IndexError/struct.error/KeyError/MemoryError/…),
which would escape the operators' narrowed corrupt-input catches and kill
executor tasks. Covers the paths single crafted blobs miss: Adam7 pass
accounting, tRNS, progressive scan state, GIF LZW tables, TIFF IFD walk.
"""

from __future__ import annotations

import os

import numpy as np

from cog3pio_spark.gif import GifDecodeError, decode_gif
from cog3pio_spark.jpeg import JpegDecodeError, decode_jpeg
from cog3pio_spark.png import PngDecodeError, decode_png
from cog3pio_spark.tiff.reader import CogReader, TiffDecodeError

DATA = os.path.join(os.path.dirname(__file__), "data")

# (name, decode, typed error, flip trials) — JPEG gets fewer trials: a
# corrupt-but-decodable stream still runs the per-bit reference decoder
# (~1-3 s/trial); the fast codecs afford broader sweeps in the same budget
CASES = [
    ("java_gray.jpg", decode_jpeg, JpegDecodeError, 5),
    ("java_rgb420.jpg", decode_jpeg, JpegDecodeError, 4),
    ("java_gray_prog.jpg", decode_jpeg, JpegDecodeError, 4),
    ("java_gray.png", decode_png, PngDecodeError, 20),
    ("java_rgba.png", decode_png, PngDecodeError, 20),
    ("java_gray_ilace.png", decode_png, PngDecodeError, 20),
    ("java_rgba_ilace.png", decode_png, PngDecodeError, 20),
    ("java_indexed.gif", decode_gif, GifDecodeError, 20),
    ("java_lzw.tif", lambda b: CogReader(b).to_numpy(), TiffDecodeError, 20),
    ("java_pb.tif", lambda b: CogReader(b).to_numpy(), TiffDecodeError, 20),
]


def _drive(decode, err_type, blob, ctx):
    try:
        out = decode(blob)
    except err_type:
        return  # typed refusal: the contract
    except Exception as exc:  # noqa: BLE001 — the point of the test
        raise AssertionError(
            f"{ctx}: {type(exc).__name__} escaped the {err_type.__name__} "
            f"taxonomy: {exc}"
        ) from exc
    assert isinstance(out, np.ndarray), ctx


def test_byte_flip_fuzz_never_escapes_error_taxonomy():
    rng = np.random.RandomState(1729)
    for name, decode, err_type, trials in CASES:
        raw = open(os.path.join(DATA, name), "rb").read()
        for trial in range(trials):
            buf = bytearray(raw)
            for _ in range(int(rng.randint(1, 4))):
                pos = int(rng.randint(0, len(buf)))
                buf[pos] ^= int(rng.randint(1, 256))
            _drive(decode, err_type, bytes(buf), f"{name} flip#{trial}")


def test_truncation_fuzz_never_escapes_error_taxonomy():
    rng = np.random.RandomState(271828)
    for name, decode, err_type, _trials in CASES:
        raw = open(os.path.join(DATA, name), "rb").read()
        cuts = sorted({int(c) for c in rng.randint(0, len(raw), size=8)})
        for cut in cuts:
            _drive(decode, err_type, raw[:cut], f"{name} cut@{cut}")
