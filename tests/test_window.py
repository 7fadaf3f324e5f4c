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


class _RangeHTTPServer:
    """In-process HTTP server honoring Range requests (loopback only) — the
    sandbox has no external network, so the HTTP range-read path is smoked
    against this second implementation of the protocol (r4, VERDICT r3 #7)."""

    def __init__(self, payload: bytes, honor_range: bool = True):
        import http.server
        import threading

        srv_self = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                data = srv_self.payload
                rng = self.headers.get("Range")
                if rng and srv_self.honor_range:
                    spec = rng.split("=", 1)[1]
                    lo, hi = spec.split("-")
                    lo, hi = int(lo), min(int(hi), len(data) - 1)
                    body = data[lo : hi + 1]
                    self.send_response(206)
                    self.send_header(
                        "Content-Range", f"bytes {lo}-{hi}/{len(data)}"
                    )
                else:
                    body = data
                    self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                srv_self.requests.append(rng)

            def log_message(self, *a):  # quiet
                pass

        self.payload = payload
        self.honor_range = honor_range
        self.requests: list = []
        self._httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self._httpd.server_address[1]
        self._t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._t.start()

    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}/t.tif"

    def close(self):
        self._httpd.shutdown()
        self._httpd.server_close()


def test_http_range_fetcher_window_decode(tiled_file):
    """CogReader.from_fetcher over http_range_fetcher against a REAL (local)
    HTTP server: window pixels equal the in-memory decode, and the ranged
    GETs fetch far fewer bytes than the object."""
    from cog3pio_spark.tiff.reader import http_range_fetcher

    p, arr = tiled_file
    raw = open(p, "rb").read()
    srv = _RangeHTTPServer(raw)
    try:
        r = CogReader.from_fetcher(http_range_fetcher(srv.url()), block_size=2048)
        np.testing.assert_array_equal(
            r.to_numpy(window=(0, 0, 16, 16)), arr[:, :16, :16]
        )
        assert r.range_cache.bytes_fetched < len(raw)
        assert all(rq and rq.startswith("bytes=") for rq in srv.requests)
    finally:
        srv.close()


def test_http_range_fetcher_degrades_on_200(tiled_file):
    """A server that ignores Range (200 + full body) must still decode
    correctly — the fetcher slices the body to the requested range."""
    from cog3pio_spark.tiff.reader import http_range_fetcher

    p, arr = tiled_file
    raw = open(p, "rb").read()
    srv = _RangeHTTPServer(raw, honor_range=False)
    try:
        r = CogReader.from_fetcher(http_range_fetcher(srv.url()), block_size=2048)
        np.testing.assert_array_equal(
            r.to_numpy(window=(5, 9, 40, 33)), arr[:, 9:33, 5:40]
        )
        # r4 review: the 200 body is cached in the fetcher closure — the
        # whole windowed decode (header + IFD + tiles) costs exactly ONE
        # download, not one re-download per range call
        assert len(srv.requests) == 1, srv.requests
    finally:
        srv.close()


def test_http_range_fetcher_200_body_cap(tiled_file):
    """ADVICE r4: the 200-fallback pins the whole body in the fetcher
    closure — past max_cached_body it must error loudly (typed, naming the
    fix) instead of silently holding a multi-GB object in worker memory."""
    import pytest

    from cog3pio_spark.tiff.reader import TiffDecodeError, http_range_fetcher

    p, _ = tiled_file
    raw = open(p, "rb").read()
    srv = _RangeHTTPServer(raw, honor_range=False)
    try:
        fetch = http_range_fetcher(srv.url(), max_cached_body=len(raw) - 1)
        with pytest.raises(TiffDecodeError, match="body-cache cap"):
            fetch(0, 8)
        # a compliant 206 server is unaffected by the cap
        srv2 = _RangeHTTPServer(raw)
        try:
            ok = http_range_fetcher(srv2.url(), max_cached_body=1)
            assert ok(0, 4) == raw[:4]
        finally:
            srv2.close()
    finally:
        srv.close()


def test_http_range_fetcher_through_decode_tiles(spark, tiled_file):
    """decode_tiles(range_read=True) dispatches http:// refs to the HTTP
    range fetcher on executors; fetched_bytes telemetry records ranged IO."""
    from cog3pio_spark.operators.decode import decode_tiles

    p, arr = tiled_file
    raw = open(p, "rb").read()
    srv = _RangeHTTPServer(raw)
    try:
        refs = spark.createDataFrame([(srv.url(),)], ["media_ref"])
        row = decode_tiles(refs, window=(0, 0, 16, 16), range_read=True).collect()[0]
        assert row["status"] == "ok"
        assert (row["height"], row["width"]) == (16, 16)
        # the fixture is smaller than the 64 KB header block, so the clamped
        # range covers the whole object — the point here is that the IO went
        # through ranged GETs (block-size economics are pinned by
        # test_range_read_window_fetches_only_needed_bytes)
        assert 0 < row["fetched_bytes"] <= len(raw)
        assert srv.requests and all(
            rq and rq.startswith("bytes=") for rq in srv.requests
        )
        assert abs(row["mean"] - float(arr[:, :16, :16].mean())) < 1e-5
    finally:
        srv.close()


def test_http_range_fetcher_error_taxonomy():
    """Connection-refused surfaces the reference-shaped fetch error."""
    from cog3pio_spark.tiff.reader import http_range_fetcher

    fetch = http_range_fetcher("http://127.0.0.1:9/t.tif")  # port 9: discard
    with pytest.raises(TiffDecodeError, match="Cannot fetch url"):
        fetch(0, 8)


def test_windowed_decode_affine_and_centroid(spark, tiled_file):
    """r4 review: windowed decode_tiles rows used to carry the FULL image's
    centroid and untranslated affine while height/width/stats described the
    window — spatial assignment downstream would place the window at the
    wrong location. The affine origin now translates to the window's
    upper-left pixel and the centroid describes the decoded extent."""
    import struct as _struct

    from cog3pio_spark.operators.decode import decode_tiles
    from cog3pio_spark.tiff.writer import write_tiff

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        arr = (np.arange(3 * 40 * 50) % 251).reshape(3, 40, 50).astype(np.uint8)
        p = os.path.join(td, "geo.tif")
        write_tiff(p, arr, tiled=True, tile_size=16,
                   pixel_scale=(0.5, 0.25), tiepoint=(0, 0, 0, 100.0, 60.0, 0))
        refs = spark.createDataFrame([("file://" + p,)], ["media_ref"])

        full = decode_tiles(refs).collect()[0]
        win = decode_tiles(refs, window=(8, 4, 24, 12)).collect()[0]
        assert win["status"] == "ok" and (win["width"], win["height"]) == (16, 8)
        # affine translated by (8, 4) pixels: c' = c + a*8, f' = f + e*4
        assert abs(win["c"] - (full["c"] + full["a"] * 8)) < 1e-12
        assert abs(win["f"] - (full["f"] + full["e"] * 4)) < 1e-12
        # centroid = window's world center, NOT the image's
        assert abs(win["centroid_x"] - (win["c"] + win["a"] * 8.0)) < 1e-12
        assert abs(win["centroid_y"] - (win["f"] + win["e"] * 4.0)) < 1e-12
        assert abs(win["centroid_x"] - full["centroid_x"]) > 1.0

        # negative overview: error row, never a silent deepest-level decode
        bad = decode_tiles(refs, overview=-1).collect()[0]
        assert bad["status"] == "error" and "out of range" in bad["error_msg"]

        # null/empty media_ref: taxonomy error row (non-null column kept)
        nulls = spark.createDataFrame([(None,), ("",)], "media_ref string")
        rows = decode_tiles(nulls).collect()
        assert all(r["status"] == "error" for r in rows)
        assert all("null or empty media_ref" in r["error_msg"] for r in rows)
        assert all(r["media_ref"] == "" for r in rows)


def test_planar_and_extra_sample_guards(tiled_file):
    """r4 review: PlanarConfiguration=2 (band-sequential) used to decode
    SCRAMBLED with status ok; an RGB-tagged 4-sample file used to decode
    through the windowed strip path that every other path rejects."""
    import struct as _struct

    from cog3pio_spark.tiff.writer import write_tiff
    import io as _io

    buf = _io.BytesIO()
    write_tiff(buf, (np.arange(300) % 250).reshape(1, 15, 20).astype(np.uint8))
    raw = bytearray(buf.getvalue())
    head = _struct.pack("<HHI", 284, 3, 1)  # PlanarConfiguration entry
    i = raw.find(head)
    assert i > 0
    raw[i + 8 : i + 10] = _struct.pack("<H", 2)  # chunky -> planar
    with pytest.raises(TiffDecodeError, match="planar configuration 2"):
        CogReader(bytes(raw))

    # RGB-tagged 4-sample (RGBA): r5 — decodes ALL FOUR samples, full and
    # windowed (the r4 reject closed the bands=3-vs-4-sample scramble; the
    # reader now keeps every declared sample instead, which is strictly
    # better: the resize path re-encodes decoded RGBA PNGs this way)
    arr4 = (np.arange(4 * 10 * 12) % 251).reshape(4, 10, 12).astype(np.uint8)
    buf2 = _io.BytesIO()
    write_tiff(buf2, arr4, photometric=2)
    r = CogReader(buf2.getvalue())
    assert r.bands == 4
    np.testing.assert_array_equal(r.to_numpy(), arr4)
    np.testing.assert_array_equal(r.to_numpy(window=(0, 0, 4, 4)), arr4[:, :4, :4])
