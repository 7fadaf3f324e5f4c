"""COG fixture registry — synthetic GeoTIFFs mirroring the reference test matrix.

Every invariant the reference asserts is reproduced as a local deterministic
file (FIXTURES.md §3):

* 20×10 ``val = y + x`` f32 gradient, mean 14.0     — src/io/geotiff.rs:254-281
* exact 1×2×3 f32 ``[[1.41,1.23,0.78],[0.32,-0.23,-1.88]]``
                                                     — src/io/geotiff.rs:342-366
* dtype matrix {u8..f64} ramps                       — src/io/geotiff.rs:50-60
* 2-band multiband (shape/mean goldens)              — src/io/geotiff.rs:283-297
* RGB u8 3-band (ColorType RGB → bands=3)            — src/io/geotiff.rs:368-380
* geo 549×549 affine (200,0,499980,0,-200,5300040)   — src/io/geotiff.rs:382-404
* DEM 63×244 linspace goldens                        — test_io_geotiff.py:141-169
* error fixtures: palette colortype, truncated file  — test_io_geotiff.py:90-116
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from cog3pio_spark.tiff.writer import write_tiff

DTYPE_MATRIX = [
    "uint8", "uint16", "uint32", "uint64",
    "int8", "int16", "int32", "int64",
    "float16", "float32", "float64",
]


def _ramp(dtype: str, h: int = 20, w: int = 20) -> np.ndarray:
    """Deterministic per-dtype ramp: values 0..h*w-1 mod a dtype-safe cap."""
    dt = np.dtype(dtype)
    # cap must fit the dtype (r4 review: 251 overflows int8's max of 127 —
    # astype wrapped to negatives, so the 'dtype-safe' ramp wasn't)
    if dt.kind in "iu":
        cap = int(min(251 if dt.itemsize == 1 else 60013, np.iinfo(dt).max))
    else:
        cap = 251 if dt.itemsize == 1 else 60013
    vals = (np.arange(h * w) % cap).reshape(1, h, w)
    return vals.astype(dtype)


def generate_fixtures(out_dir: str) -> list[dict]:
    """Write the full fixture matrix into ``out_dir``; return registry rows.

    Registry row: media_ref, dtype, bands, height, width, x_scale, y_scale,
    x_origin, y_origin, expected_mean, pixel_sha256, valid.
    """
    os.makedirs(out_dir, exist_ok=True)
    rows: list[dict] = []

    def register(name: str, arr: np.ndarray | None, path: str, geo=None, valid=True):
        entry = {
            "media_ref": "file://" + path,
            "dtype": str(arr.dtype) if arr is not None else "",
            "bands": int(arr.shape[0]) if arr is not None else 0,
            "height": int(arr.shape[1]) if arr is not None else 0,
            "width": int(arr.shape[2]) if arr is not None else 0,
            "x_scale": float(geo[0]) if geo else 0.0,
            "y_scale": float(geo[1]) if geo else 0.0,
            "x_origin": float(geo[2]) if geo else 0.0,
            "y_origin": float(geo[3]) if geo else 0.0,
            "expected_mean": float(np.asarray(arr, dtype=np.float64).mean())
            if arr is not None
            else 0.0,
            # sha of the DECODED tensor bytes — band-major (the engine
            # de-interleaves chunky data; SURVEY §1.2: the reference asserts
            # only shape + order-insensitive mean for multiband, so the
            # engine pins the true per-band layout).
            "pixel_sha256": hashlib.sha256(
                np.ascontiguousarray(arr).tobytes()
            ).hexdigest()
            if arr is not None
            else "",
            "valid": valid,
        }
        rows.append(entry)

    # 1. gradient 20x10, val = y + x, mean 14.0 (geotiff.rs:254-281)
    yy, xx = np.mgrid[0:10, 0:20]
    grad = (yy + xx).astype(np.float32)[np.newaxis]
    p = os.path.join(out_dir, "grad_f32_20x10.tif")
    write_tiff(p, grad, pixel_scale=(10.0, 10.0), tiepoint=(0, 0, 0, 0.0, 100.0, 0))
    register("grad", grad, p, geo=(10.0, 10.0, 0.0, 100.0))

    # 2. exact 1x2x3 float32 (geotiff.rs:342-366)
    exact = np.array([[[1.41, 1.23, 0.78], [0.32, -0.23, -1.88]]], dtype=np.float32)
    p = os.path.join(out_dir, "exact_f32_1x2x3.tif")
    write_tiff(p, exact, pixel_scale=(1.0, 1.0), tiepoint=(0, 0, 0, 0.0, 2.0, 0))
    register("exact", exact, p, geo=(1.0, 1.0, 0.0, 2.0))

    # 3. dtype matrix, striped + deflate variants alternating
    for i, dt in enumerate(DTYPE_MATRIX):
        arr = _ramp(dt)
        p = os.path.join(out_dir, f"dtype_{dt}_20x20.tif")
        write_tiff(
            p,
            arr,
            compression="deflate" if i % 2 else "none",
            tiled=bool(i % 3 == 0),
            pixel_scale=(30.0, 30.0),
            tiepoint=(0, 0, 0, 600000.0 + i * 600.0, 5400000.0 - i * 600.0, 0),
        )
        register(dt, arr, p, geo=(30.0, 30.0, 600000.0 + i * 600.0, 5400000.0 - i * 600.0))

    # 4. multiband 2x64x64 f32 (shape/mean goldens; layout per SURVEY §1.2)
    rng = np.random.RandomState(42)
    mb = rng.rand(2, 64, 64).astype(np.float32)
    p = os.path.join(out_dir, "multiband_f32_2x64x64.tif")
    write_tiff(p, mb, pixel_scale=(20.0, 20.0), tiepoint=(0, 0, 0, 500000.0, 5300000.0, 0))
    register("mb", mb, p, geo=(20.0, 20.0, 500000.0, 5300000.0))

    # 5. RGB u8 3-band
    rgb = (rng.rand(3, 32, 32) * 255).astype(np.uint8)
    p = os.path.join(out_dir, "rgb_u8_3band.tif")
    write_tiff(p, rgb, photometric=2, pixel_scale=(60.0, 60.0),
               tiepoint=(0, 0, 0, 530000.0, 5290000.0, 0))
    register("rgb", rgb, p, geo=(60.0, 60.0, 530000.0, 5290000.0))

    # 6. geo 549x549 with the reference's exact affine golden
    geo_arr = ((np.arange(549 * 549) % 997) / 997.0).astype(np.float32).reshape(1, 549, 549)
    p = os.path.join(out_dir, "geo_549x549.tif")
    write_tiff(p, geo_arr, tiled=True, tile_size=64, compression="deflate",
               pixel_scale=(200.0, 200.0), tiepoint=(0, 0, 0, 499980.0, 5300040.0, 0))
    register("geo549", geo_arr, p, geo=(200.0, 200.0, 499980.0, 5300040.0))

    # 7. DEM 63x244 linspace golden (test_io_geotiff.py:141-169)
    dem = ((np.arange(244 * 63) % 101) / 10.0).astype(np.float32).reshape(1, 244, 63)
    p = os.path.join(out_dir, "dem_63x244.tif")
    write_tiff(p, dem, pixel_scale=(1.0, 1.0),
               tiepoint=(0, 0, 0, 1679617.031 - 0.5, 5362323.781 + 0.5, 0))
    register("dem", dem, p, geo=(1.0, 1.0, 1679617.031 - 0.5, 5362323.781 + 0.5))

    # 7b. compression parity: LZW (+horizontal-differencing predictor) and
    # PackBits — the tiff-crate compressions the reference decodes beyond
    # deflate (/root/reference/Cargo.toml:49); codecs are interop-verified
    # against Java ImageIO both ways (tests/test_tiff.py)
    lzw = _ramp("uint16", 24, 24)
    p = os.path.join(out_dir, "lzw_u16_24x24.tif")
    write_tiff(p, lzw, tiled=True, compression="lzw", predictor=2,
               pixel_scale=(15.0, 15.0), tiepoint=(0, 0, 0, 610000.0, 5395000.0, 0))
    register("lzw", lzw, p, geo=(15.0, 15.0, 610000.0, 5395000.0))

    pb = _ramp("uint8", 16, 40)
    p = os.path.join(out_dir, "packbits_u8_16x40.tif")
    write_tiff(p, pb, compression="packbits",
               pixel_scale=(25.0, 25.0), tiepoint=(0, 0, 0, 612000.0, 5396000.0, 0))
    register("packbits", pb, p, geo=(25.0, 25.0, 612000.0, 5396000.0))

    # 8. error fixtures
    pal = np.zeros((1, 8, 8), dtype=np.uint8)
    p = os.path.join(out_dir, "err_palette.tif")
    write_tiff(p, pal, palette=True)
    register("pal", None, p, valid=False)

    p = os.path.join(out_dir, "err_truncated.tif")
    with open(p, "wb") as f:
        f.write(b"II\x2a\x00trunc")
    register("trunc", None, p, valid=False)

    return rows


def generate_tile_farm(out_dir: str, n: int = 400, seed: int = 42) -> list[str]:
    """Deterministic 'tile farm' for benchmarking: ``n`` small GeoTIFFs with
    geo tags spread across the fixture extent, mixed dtypes/sizes/layouts.

    Decode work per tile is real (strips/tiles + deflate), so the bench's
    decode stage measures actual kernel throughput, not 19 cached fixtures.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    dtypes = ["uint8", "uint16", "int32", "float32", "float64"]
    refs = []
    for i in range(n):
        path = os.path.join(out_dir, f"tile_{i:05d}.tif")
        refs.append("file://" + path)
        # draw BEFORE the skip check so a partially generated farm resumes
        # with the same rng state a clean run would have (r4 review:
        # skip-before-draw shifted every later tile's dtype/size/pixels,
        # breaking cross-run comparability of bench numbers)
        dt = dtypes[i % len(dtypes)]
        h = w = int(rng.choice([32, 48, 64]))
        arr = (rng.rand(1, h, w) * 200).astype(dt)
        if os.path.exists(path):
            continue
        x0 = 480_000.0 + (i % 40) * 3_500.0
        y0 = 5_410_000.0 - (i // 40) * 20_000.0
        write_tiff(
            path,
            arr,
            tiled=bool(i % 2),
            compression="deflate" if i % 3 else "none",
            pixel_scale=(30.0, 30.0),
            tiepoint=(0, 0, 0, x0, y0, 0),
        )
    return refs


def default_fixture_dir() -> str:
    """Fixture location: repo tests/fixtures/cogs when running from a
    checkout; a writable scratch dir when the package is deployed as a zip
    via spark-submit --py-files (COG3PIO_FIXTURE_DIR overrides)."""
    env = os.environ.get("COG3PIO_FIXTURE_DIR")
    if env:
        return env
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if os.path.isdir(root):  # real checkout
        return os.path.join(root, "tests", "fixtures", "cogs")
    import tempfile

    return os.path.join(tempfile.gettempdir(), "cog3pio_fixtures", "cogs")


def ensure_fixtures(out_dir: str | None = None) -> list[dict]:
    """Generate the fixture matrix (idempotent + deterministic) and return
    the registry rows. Files are regenerated in place if already present —
    generation is cheap and seeded, so this doubles as a consistency check."""
    out_dir = out_dir or default_fixture_dir()
    return generate_fixtures(out_dir)
