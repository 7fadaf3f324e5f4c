"""PNG decoder: EXACT interop against Java ImageIO (PNG is lossless, so
unlike the JPEG ±2 tolerance the contract here is bit-perfect equality).
Fixtures are committed ImageIO-written files; round-trip tests re-encode
through the JVM at test time for palette/16-bit variants."""

from __future__ import annotations

import os

import numpy as np
import pytest

from cog3pio_spark.png import PngDecodeError, decode_png

DATA = os.path.join(os.path.dirname(__file__), "data")


def _s32(v: int) -> int:
    return v - (1 << 32) if v >= (1 << 31) else v


def _encode_png(spark, bi) -> bytes:
    jvm = spark._jvm
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(bi, "png", baos)
    return bytes(baos.toByteArray())


def test_gray_fixture_exact():
    """Committed gray PNG (pixel formula (x*11+y*5)%256, 47x33) decodes
    bit-perfectly — no JVM needed, the formula IS the oracle."""
    raw = open(os.path.join(DATA, "java_gray.png"), "rb").read()
    got = decode_png(raw)
    exp = np.fromfunction(lambda y, x: (x * 11 + y * 5) % 256, (33, 47)).astype(np.uint8)
    assert got.shape == (1, 33, 47)
    np.testing.assert_array_equal(got[0], exp)


def test_rgba_fixture_exact():
    """Committed random RGBA PNG (hard case for Sub/Paeth filters): decode
    equals the committed expected array byte-for-byte."""
    raw = open(os.path.join(DATA, "java_rgba.png"), "rb").read()
    exp = np.load(os.path.join(DATA, "java_rgba_expected.npy"))
    np.testing.assert_array_equal(decode_png(raw), exp)


def test_palette_and_16bit_roundtrip_exact(spark):
    """Palette (TYPE_BYTE_INDEXED) and 16-bit gray PNGs round-trip through
    ImageIO encode → our decode with exact pixels."""
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage

    bi = BI(16, 8, BI.TYPE_BYTE_INDEXED)
    for y in range(8):
        for x in range(16):
            bi.setRGB(x, y, _s32(((x * 16) % 256 << 16) | ((y * 32) % 256 << 8) | 128))
    ref = np.zeros((3, 8, 16), dtype=np.uint8)
    for y in range(8):
        for x in range(16):
            v = bi.getRGB(x, y)
            ref[:, y, x] = [(v >> 16) & 255, (v >> 8) & 255, v & 255]
    np.testing.assert_array_equal(decode_png(_encode_png(spark, bi)), ref)

    rng = np.random.RandomState(23)
    g16 = rng.randint(0, 65536, (9, 14)).astype(np.uint16)
    bi = BI(14, 9, BI.TYPE_USHORT_GRAY)
    r = bi.getRaster()
    for y in range(9):
        for x in range(14):
            r.setSample(x, y, 0, int(g16[y, x]))
    got = decode_png(_encode_png(spark, bi))
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got[0], g16)


def test_png_error_taxonomy():
    """Honest failures: bad signature, bad interlace method, corrupt IDAT,
    and a sequential stream relabeled Adam7 (byte accounting catches it)."""
    with pytest.raises(PngDecodeError, match="bad signature"):
        decode_png(b"\xff\xd8" + b"x" * 32)
    raw = bytearray(open(os.path.join(DATA, "java_gray.png"), "rb").read())
    raw[8 + 8 + 12] = 2  # IHDR interlace byte (CRC not validated by design)
    with pytest.raises(PngDecodeError, match="bad interlace method"):
        decode_png(bytes(raw))
    # r5: interlace=1 now DECODES — a sequential stream relabeled Adam7 has
    # the wrong filtered-byte total (7 passes each carry filter bytes) and
    # must fail the length check, not scramble pixels
    raw[8 + 8 + 12] = 1
    with pytest.raises(PngDecodeError, match="filtered bytes"):
        decode_png(bytes(raw))
    raw2 = bytearray(open(os.path.join(DATA, "java_gray.png"), "rb").read())
    idat = bytes(raw2).find(b"IDAT")
    raw2[idat + 8 : idat + 16] = b"\x00" * 8  # corrupt the zlib stream
    with pytest.raises(PngDecodeError, match="corrupt IDAT|filtered bytes"):
        decode_png(bytes(raw2))


def _encode_png_interlaced(spark, bi) -> bytes:
    jvm = spark._jvm
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    wr = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    wr.setOutput(ios)
    param = wr.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    wr.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    ios.flush()
    raw = bytes(baos.toByteArray())
    assert raw[8 + 8 + 12] == 1, "writer did not interlace"
    return raw


def test_adam7_fixtures_exact():
    """r5 (VERDICT r4 #7): committed ImageIO-written Adam7 interlaced PNGs
    decode bit-perfectly — gray (formula oracle) and random RGBA (hard case
    for per-pass Sub/Paeth filters)."""
    raw = open(os.path.join(DATA, "java_gray_ilace.png"), "rb").read()
    assert raw[8 + 8 + 12] == 1  # really interlaced
    got = decode_png(raw)
    exp = np.fromfunction(lambda y, x: (x * 11 + y * 5) % 256, (33, 47)).astype(np.uint8)
    np.testing.assert_array_equal(got[0], exp)

    raw = open(os.path.join(DATA, "java_rgba_ilace.png"), "rb").read()
    exp = np.load(os.path.join(DATA, "java_rgba_ilace_expected.npy"))
    np.testing.assert_array_equal(decode_png(raw), exp)


def test_adam7_roundtrip_variants_exact(spark):
    """Adam7 across the sample-layout matrix via live ImageIO round-trips:
    16-bit gray (big-endian pairs per pass), palette (TYPE_BYTE_INDEXED),
    and edge sizes where several of the 7 passes are EMPTY (w or h < pass
    origin) or single-pixel."""
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage

    rng = np.random.RandomState(41)
    g16 = rng.randint(0, 65536, (13, 11)).astype(np.uint16)
    bi = BI(11, 13, BI.TYPE_USHORT_GRAY)
    r = bi.getRaster()
    for y in range(13):
        for x in range(11):
            r.setSample(x, y, 0, int(g16[y, x]))
    got = decode_png(_encode_png_interlaced(spark, bi))
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got[0], g16)

    bi = BI(16, 8, BI.TYPE_BYTE_INDEXED)
    for y in range(8):
        for x in range(16):
            bi.setRGB(x, y, _s32(((x * 16) % 256 << 16) | ((y * 32) % 256 << 8) | 128))
    ref = np.zeros((3, 8, 16), dtype=np.uint8)
    for y in range(8):
        for x in range(16):
            v = bi.getRGB(x, y)
            ref[:, y, x] = [(v >> 16) & 255, (v >> 8) & 255, v & 255]
    np.testing.assert_array_equal(decode_png(_encode_png_interlaced(spark, bi)), ref)

    for w, h in ((1, 1), (3, 2), (2, 9), (8, 1)):
        arr = rng.randint(0, 256, (h, w)).astype(np.uint8)
        bi = BI(w, h, BI.TYPE_BYTE_GRAY)
        r = bi.getRaster()
        for y in range(h):
            for x in range(w):
                r.setSample(x, y, 0, int(arr[y, x]))
        got = decode_png(_encode_png_interlaced(spark, bi))
        np.testing.assert_array_equal(got[0], arr, err_msg=f"{w}x{h}")


def test_png_through_spark_operators(spark):
    """extract_features computes PIXEL statistics for PNG blobs and
    resize_media really resizes a PNG (re-encoded as TIFF)."""
    from cog3pio_spark.operators.multimodal import extract_features, resize_media
    from cog3pio_spark.tiff.reader import CogReader

    raw = open(os.path.join(DATA, "java_gray.png"), "rb").read()
    df = spark.createDataFrame([("p1", raw)], ["media_id", "blob"])
    feat = extract_features(df).collect()[0]
    assert feat["media_type"] == "image/png;decoded"
    px = decode_png(raw).astype(np.float64)
    assert abs(feat["features"][14] - px.mean()) < 1e-9

    res = resize_media(df, 24, 16).collect()[0]
    assert res["status"] == "ok"
    back = CogReader(bytes(res["resized"])).to_numpy()
    arr = decode_png(raw)
    yi = ((np.arange(16) + 0.5) * 33 / 16).astype(int)
    xi = ((np.arange(24) + 0.5) * 47 / 24).astype(int)
    np.testing.assert_array_equal(back, arr[:, yi][:, :, xi])


def test_png_palette_index_out_of_range():
    """r3 review guard: a palette index past the PLTE entry count raises
    PngDecodeError, never a raw numpy IndexError."""
    import struct
    import zlib as _z

    def chunk(ctype, body):
        return struct.pack(">I", len(body)) + ctype + body + b"\x00\x00\x00\x00"

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)  # 1x1, 8-bit palette
    plte = b"\x10\x20\x30"  # ONE entry
    idat = _z.compress(b"\x00\xc8")  # filter 0 + index 200
    raw = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
           + chunk(b"IDAT", idat) + chunk(b"IEND", b""))
    with pytest.raises(PngDecodeError, match="palette index 200 out of range"):
        decode_png(raw)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib as _z

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", _z.crc32(ctype + body))
    )


def test_trns_palette_and_colorkey(spark):
    """r5 review: tRNS was silently ignored — transparent palette/colorkey
    PNGs decoded opaque with alpha dropped. Palette tRNS now yields RGBA,
    gray/RGB colorkey an appended alpha band; both pinned against Java
    ImageIO reading the same bytes (valid CRCs)."""
    import struct
    import zlib as _z

    def imageio_argb(raw, w, h):
        jvm = spark._jvm
        bi = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(raw))
        assert bi is not None
        out = np.zeros((4, h, w), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                v = bi.getRGB(x, y) & 0xFFFFFFFF
                out[:, y, x] = [(v >> 16) & 255, (v >> 8) & 255, v & 255, v >> 24]
        return out

    sig = b"\x89PNG\r\n\x1a\n"
    # palette 2x2: indices [[0,1],[2,1]], entry 0 transparent, 1 half, 2 opaque
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    trns = bytes([0, 128])  # entry 2 defaults to 255
    idat = _z.compress(b"\x00\x00\x01\x00\x02\x01")
    raw = (
        sig + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
        + _chunk(b"tRNS", trns) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")
    )
    got = decode_png(raw)
    assert got.shape == (4, 2, 2)
    exp_a = np.array([[0, 128], [255, 128]], dtype=np.uint8)
    np.testing.assert_array_equal(got[3], exp_a)
    ref = imageio_argb(raw, 2, 2)
    np.testing.assert_array_equal(got[3], ref[3])
    # RGB must agree wherever not fully transparent (ImageIO zeroes
    # fully-transparent pixels' color in some paths)
    vis = exp_a > 0
    for b in range(3):
        np.testing.assert_array_equal(got[b][vis], ref[b][vis])

    # gray colorkey 3x1: values [7, 9, 7], key 7 -> alpha 0
    ihdr = struct.pack(">IIBBBBB", 3, 1, 8, 0, 0, 0, 0)
    idat = _z.compress(b"\x00\x07\x09\x07")
    raw = (
        sig + _chunk(b"IHDR", ihdr) + _chunk(b"tRNS", struct.pack(">H", 7))
        + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")
    )
    got = decode_png(raw)
    assert got.shape == (2, 1, 3)
    np.testing.assert_array_equal(got[0], [[7, 9, 7]])
    np.testing.assert_array_equal(got[1], [[0, 255, 0]])
    ref = imageio_argb(raw, 3, 1)
    np.testing.assert_array_equal(got[1], ref[3])

    # RGB colorkey 2x1: first pixel matches key exactly
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    idat = _z.compress(b"\x00\x10\x20\x30\x10\x20\x31")
    raw = (
        sig + _chunk(b"IHDR", ihdr)
        + _chunk(b"tRNS", struct.pack(">HHH", 0x10, 0x20, 0x30))
        + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")
    )
    got = decode_png(raw)
    assert got.shape == (4, 1, 2)
    np.testing.assert_array_equal(got[3], [[0, 255]])
    ref = imageio_argb(raw, 2, 1)
    np.testing.assert_array_equal(got[3], ref[3])
