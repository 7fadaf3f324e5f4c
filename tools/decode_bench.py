"""Reference-workload decode benchmark (BASELINE.md comparison point).

The reference's criterion bench decodes one Sentinel-2 TCI GeoTIFF
(3×10980×10980 u8, DEFLATE, ~318 MB) and reports bytes/sec
(/root/reference/benches/read_cog.rs:9-12,107-110). This script synthesizes
the same-shape image with our writer (no network in-sandbox), then measures:

  1. single-thread full decode (the reference's exact workload), and
  2. Spark-parallel decode of the same pixel volume as 36 tiles of
     3×1830×1830 (the engine's actual unit of work — one Sentinel-2 granule
     split into its natural tile grid).

Writes results into BENCH/decode_bench.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np

SCRATCH = os.path.join(HERE, "tests", "fixtures", "decode_bench")


def synth_tci(path: str, h: int = 10980, w: int = 10980) -> int:
    """Sentinel-2-like 3-band u8: smooth gradients + texture (compresses
    like imagery: a few percent DEFLATE ratio, not random-noise 100%)."""
    if os.path.exists(path):
        return os.path.getsize(path)
    from cog3pio_spark.tiff.writer import write_tiff

    yy, xx = np.mgrid[0:h, 0:w]
    rng = np.random.RandomState(42)
    base = (xx * 0.01 + yy * 0.013)
    bands = []
    for b in range(3):
        # per-pixel sensor-like noise: DEFLATE ratio lands near the real
        # TCI's ~0.88 (318 MB / 362 MB), so decompression cost is realistic
        noise = rng.randint(0, 100, size=(h, w))
        bands.append((((base * (b + 1)) % 156) + noise).astype(np.uint8))
    arr = np.stack(bands)
    write_tiff(
        path, arr, tiled=True, tile_size=512, compression="deflate",
        pixel_scale=(10.0, 10.0), tiepoint=(0, 0, 0, 499980.0, 5300040.0, 0),
    )
    return os.path.getsize(path)


def bench_single(path: str, n: int = 3) -> dict:
    from cog3pio_spark.tiff.reader import CogReader

    buf = open(path, "rb").read()
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        arr = CogReader(buf).to_numpy()
        times.append(time.perf_counter() - t0)
    px_bytes = arr.nbytes
    best = min(times)
    return {
        "file_bytes": len(buf),
        "pixel_bytes": px_bytes,
        "decode_sec_best": round(best, 3),
        "decode_sec_all": [round(t, 3) for t in times],
        "file_MBps": round(len(buf) / best / 1e6, 1),
        "pixel_MBps": round(px_bytes / best / 1e6, 1),
        "shape": list(arr.shape),
        "dtype": str(arr.dtype),
    }


def bench_spark_tiles(n_tiles: int = 36, tile_hw: int = 1830) -> dict:
    """Same pixel volume as the single file, as the engine's tile grid."""
    from pyspark.sql import functions as F

    from cog3pio_spark.operators.decode import decode_tiles
    from cog3pio_spark.session import get_spark
    from cog3pio_spark.tiff.writer import write_tiff

    os.makedirs(SCRATCH, exist_ok=True)
    rng = np.random.RandomState(7)
    refs = []
    for i in range(n_tiles):
        p = os.path.join(SCRATCH, f"granule_{i:02d}.tif")
        refs.append("file://" + p)
        # draw BEFORE the skip so partial generations resume with the same
        # rng state (r4 review: same defect as generate_tile_farm); the
        # deterministic ramp is built only when the file is actually
        # written (r5 review: the mgrid pair + 3-band stack cost several
        # hundred MB of allocations per tile on fully-warm re-runs)
        noise = rng.randint(0, 100, (3, tile_hw, tile_hw)).astype(np.uint8)
        if os.path.exists(p):
            continue
        yy, xx = np.mgrid[0:tile_hw, 0:tile_hw]
        arr = np.stack(
            [((xx * 0.01 + yy * 0.013) * (b + 1) % 156).astype(np.uint8) for b in range(3)]
        )
        arr += noise
        write_tiff(p, arr, tiled=True, tile_size=512, compression="deflate",
                   pixel_scale=(10.0, 10.0), tiepoint=(0, 0, 0, 499980.0 + i * 20000.0, 5300040.0, 0))
    spark = get_spark("decode-bench", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS','32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame([(r,) for r in refs], ["media_ref"]).repartition(n_tiles)
    decode_tiles(df).count()  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        rows = decode_tiles(df).select("status").collect()
        times.append(time.perf_counter() - t0)
    bad = [r for r in rows if r["status"] != "ok"]
    assert not bad, f"decode bench: {len(bad)} rows failed (error rows are near-instant and would inflate MBps)"  # r4 review: the old assert was vacuous
    px = n_tiles * 3 * tile_hw * tile_hw
    best = min(times)
    spark.stop()
    return {
        "n_tiles": n_tiles,
        "pixel_bytes": px,
        "decode_sec_best": round(best, 3),
        "pixel_MBps": round(px / best / 1e6, 1),
    }


def main() -> None:
    os.makedirs(SCRATCH, exist_ok=True)
    tci = os.path.join(SCRATCH, "tci_like.tif")
    size = synth_tci(tci)
    print(f"synth TCI-like file: {size/1e6:.0f} MB", file=sys.stderr)
    single = bench_single(tci)
    print(f"single-thread: {single}", file=sys.stderr)
    parallel = bench_spark_tiles()
    print(f"spark tiles: {parallel}", file=sys.stderr)
    out = {"single_thread_full_image": single, "spark_parallel_tiles": parallel}
    with open(os.path.join(HERE, "BENCH", "decode_bench.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
