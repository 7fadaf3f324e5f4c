"""Windowed (partial) COG decode — north_star extension beyond the
reference's full-image decode (src/io/geotiff.rs:39-64)."""

from __future__ import annotations

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
