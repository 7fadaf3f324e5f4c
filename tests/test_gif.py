"""GIF decoder: EXACT interop against Java ImageIO (lossless for ≤256-color
frames — same bit-perfect contract as PNG). The GIF LZW variant (LSB-first,
clear/EOI, no early change) is independent of the TIFF LZW implementation."""

from __future__ import annotations

import os

import numpy as np
import pytest

from cog3pio_spark.gif import GifDecodeError, decode_gif

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_indexed_fixture_exact():
    raw = open(os.path.join(DATA, "java_indexed.gif"), "rb").read()
    exp = np.load(os.path.join(DATA, "java_gif_expected.npy"))
    got = decode_gif(raw)
    assert got.shape == (3, 17, 31)
    np.testing.assert_array_equal(got, exp)


def test_gray_ramp_roundtrip_exact(spark):
    """ImageIO-encoded gray ramp (forces LZW code-width growth) decodes
    bit-perfectly against ImageIO's own decode."""
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    g = np.tile(np.arange(64, dtype=np.uint8) * 4, (9, 1))
    bi = BI(64, 9, BI.TYPE_BYTE_GRAY)
    r = bi.getRaster()
    for y in range(9):
        for x in range(64):
            r.setSample(x, y, 0, int(g[y, x]))
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "gif", baos)
    data = bytes(baos.toByteArray())
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(data))
    ref = np.zeros((3, 9, 64), dtype=np.uint8)
    for y in range(9):
        for x in range(64):
            v = img.getRGB(x, y)
            ref[:, y, x] = [(v >> 16) & 255, (v >> 8) & 255, v & 255]
    np.testing.assert_array_equal(decode_gif(data), ref)


def test_gif_error_taxonomy():
    with pytest.raises(GifDecodeError, match="bad signature"):
        decode_gif(b"\x89PNG\r\n\x1a\n" + b"x" * 16)
    raw = open(os.path.join(DATA, "java_indexed.gif"), "rb").read()
    with pytest.raises(GifDecodeError, match="expected .* pixels|no image data"):
        decode_gif(raw[: len(raw) // 2])


def test_gif_through_spark_operators(spark):
    """extract_features computes pixel stats for GIF blobs; resize_media
    really resizes (re-encoded as TIFF)."""
    from cog3pio_spark.operators.multimodal import (
        attach_media_meta,
        extract_features,
        resize_media,
    )
    from cog3pio_spark.tiff.reader import CogReader

    raw = open(os.path.join(DATA, "java_indexed.gif"), "rb").read()
    df = spark.createDataFrame([("g1", raw)], ["media_id", "blob"])
    assert attach_media_meta(df).collect()[0]["media_type"] == "image/gif"
    feat = extract_features(df).collect()[0]
    assert feat["media_type"] == "image/gif;decoded"
    px = decode_gif(raw).astype(np.float64)
    assert abs(feat["features"][14] - px.mean()) < 1e-9
    res = resize_media(df, 16, 8).collect()[0]
    assert res["status"] == "ok"
    arr = decode_gif(raw)
    yi = ((np.arange(8) + 0.5) * 17 / 8).astype(int)
    xi = ((np.arange(16) + 0.5) * 31 / 16).astype(int)
    np.testing.assert_array_equal(
        CogReader(bytes(res["resized"])).to_numpy(), arr[:, yi][:, :, xi]
    )


def test_offset_subrect_first_frame_composited():
    """r5 review: image-descriptor offsets were discarded — a first frame
    covering a sub-rectangle came back mispositioned with frame-sized (not
    screen-sized) output. It must composite at (ix,iy) onto the logical
    screen filled with the background color."""
    import struct

    # logical screen 4x3, GCT 2 entries (red, green), background index 1
    hdr = b"GIF89a" + struct.pack("<HHBBB", 4, 3, 0x80, 1, 0)
    gct = bytes([255, 0, 0, 0, 255, 0])
    # frame at (1,1), 2x1, pixels [idx0, idx1]; min_code_size=2
    desc = b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 1, 0)
    # codes (width 3, LSB-first): clear(4), 0, 1, eoi(5) -> bytes 44 0A
    lzw = bytes([2, 2, 0x44, 0x0A, 0])
    raw = hdr + gct + desc + lzw + b"\x3b"
    got = decode_gif(raw)
    assert got.shape == (3, 3, 4)
    exp = np.zeros((3, 3, 4), dtype=np.uint8)
    exp[1, :, :] = 255  # background = green everywhere
    exp[:, 1, 1] = [255, 0, 0]  # frame pixel 0 = red at (1,1)
    exp[:, 1, 2] = [0, 255, 0]  # frame pixel 1 = green at (2,1)
    np.testing.assert_array_equal(got, exp)

    # out-of-bounds frame rect: loud typed error, not silent clipping
    bad_desc = b"\x2c" + struct.pack("<HHHHB", 3, 1, 2, 1, 0)
    bad = hdr + gct + bad_desc + lzw + b"\x3b"
    with pytest.raises(GifDecodeError, match="exceeds logical screen"):
        decode_gif(bad)
