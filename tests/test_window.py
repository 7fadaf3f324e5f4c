"""Windowed (partial) COG decode — north_star extension beyond the
reference's full-image decode (src/io/geotiff.rs:39-64)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from cog3pio_spark.tiff.reader import CogReader, TiffDecodeError
from cog3pio_spark.tiff.writer import write_tiff


@pytest.fixture(scope="module")
def tiled_file(tmp_path_factory):
    rng = np.random.RandomState(2)
    arr = (rng.rand(1, 70, 53) * 100).astype(np.float32)
    p = str(tmp_path_factory.mktemp("win") / "t.tif")
    write_tiff(p, arr, tiled=True, tile_size=16, compression="deflate")
    return p, arr


def test_window_matches_full_crop(tiled_file):
    p, arr = tiled_file
    r = CogReader(open(p, "rb").read())
    np.testing.assert_array_equal(
        r.to_numpy(window=(5, 9, 40, 33)), arr[:, 9:33, 5:40]
    )


def test_window_skips_tiles(tiled_file, monkeypatch):
    """Only intersecting tiles are decompressed (count _chunk calls)."""
    p, arr = tiled_file
    r = CogReader(open(p, "rb").read())
    calls = []
    orig = r._chunk
    monkeypatch.setattr(
        r, "_chunk", lambda o, c, s=None: calls.append(o) or orig(o, c, s)
    )
    r.to_numpy(window=(0, 0, 16, 16))  # exactly one 16×16 tile
    assert len(calls) == 1
    calls.clear()
    r.to_numpy()
    assert len(calls) == 4 * 5  # full grid: ceil(53/16) × ceil(70/16)


def test_window_striped(tmp_path):
    rng = np.random.RandomState(3)
    arr = (rng.rand(2, 33, 21) * 9).astype(np.int16)
    p = str(tmp_path / "s.tif")
    write_tiff(p, arr, tiled=False)
    r = CogReader(open(p, "rb").read())
    np.testing.assert_array_equal(
        r.to_numpy(window=(2, 5, 19, 30)), arr[:, 5:30, 2:19]
    )


def test_empty_window(tiled_file):
    p, _ = tiled_file
    r = CogReader(open(p, "rb").read())
    with pytest.raises(TiffDecodeError, match="Empty decode window"):
        r.to_numpy(window=(60, 0, 80, 10))  # fully outside


def test_range_read_window_fetches_only_needed_bytes(tmp_path):
    """Range-read COG path (r3, beyond-reference): opening via a range
    fetcher reads only header/IFD blocks; a window decode then fetches only
    the intersecting tile ranges. The reference always GETs the whole
    object (src/python/adapters.rs:158-168) — this is the cloud-optimized
    behavior the format exists for. Pixels must equal the whole-buffer
    decode exactly."""
    from cog3pio_spark.tiff.reader import CogReader, file_range_fetcher

    rng = np.random.RandomState(3)
    arr = (rng.rand(1, 256, 256) * 255).astype("uint8")
    p = str(tmp_path / "big.tif")
    write_tiff(p, arr, tiled=True, tile_size=16, compression="deflate")
    file_size = os.path.getsize(p)

    calls = []
    inner = file_range_fetcher(p)

    def spy(off, n):
        calls.append((off, n))
        return inner(off, n)

    r = CogReader.from_fetcher(spy, block_size=4096)
    header_bytes = r.range_cache.bytes_fetched
    assert header_bytes < file_size // 4  # construction never reads pixels

    win = r.to_numpy(window=(3, 5, 40, 29))
    np.testing.assert_array_equal(
        win, CogReader(open(p, "rb").read()).to_numpy(window=(3, 5, 40, 29))
    )
    np.testing.assert_array_equal(win, arr[:, 5:29, 3:40])
    # 16x16 tile grid: window spans tiles x 0..2, y 0..1 -> 6 of 256 tiles;
    # total fetched stays a sliver of the file
    assert r.range_cache.bytes_fetched < file_size // 4, (
        r.range_cache.bytes_fetched, file_size
    )

    # full decode through the range path still equals the buffer path
    r2 = CogReader.from_fetcher(file_range_fetcher(p))
    np.testing.assert_array_equal(r2.to_numpy(), arr)
