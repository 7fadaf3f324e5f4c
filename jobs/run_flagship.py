"""spark-submit entry point for the flagship pipeline (north_rule contract).

    python tools/build_zip.py
    spark-submit --master <cluster> --py-files dist/cog3pio_spark.zip \
        jobs/run_flagship.py --docs <parquet> --out <checkpoint-base> \
        [--n-docs 1000000] [--polygons 64]

In-sandbox the same file runs under local[N]; on a cluster nothing changes
except --master. Output is written through the partition-manifest checkpoint
(resume-safe: re-submitting after a kill skips completed cell ranges).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default=None, help="interleaved docs parquet path")
    ap.add_argument("--out", required=True, help="checkpoint base dir")
    ap.add_argument("--n-docs", type=int, default=1_000_000,
                    help="synthesize this many docs if --docs not given")
    ap.add_argument("--polygons", type=int, default=64)
    ap.add_argument("--s2-partitions", type=int, default=0,
                    help="range partitions for the checkpointed output (0 = default parallelism)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # spark-submit provides the session; fall back to local for direct runs
    spark = SparkSession.builder.appName("cog3pio-flagship").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from cog3pio_spark.fixtures.polygons import polygons_df
    from cog3pio_spark.operators.assign import range_partition_by_cell
    from cog3pio_spark.operators.checkpoint import write_checkpointed
    from cog3pio_spark.operators.tile_kernel import fused_decode_assign_pip
    from cog3pio_spark.plans.flagship import doc_media_refs, flagship_pipeline

    if args.docs:
        docs = spark.read.parquet(args.docs)
    else:
        from cog3pio_spark.fixtures.cogs import ensure_fixtures

        refs = [r["media_ref"] for r in ensure_fixtures() if r["valid"]]
        from cog3pio_spark.fixtures.docs import interleaved_docs

        docs = interleaved_docs(spark, args.n_docs, refs)

    polys = polygons_df(spark, args.polygons)

    t0 = time.perf_counter()
    # per-polygon aggregates (driver-side result)
    agg_rows = flagship_pipeline(docs, polys).collect()

    # full tile assignment table → range-partitioned, checkpointed sink
    par = args.s2_partitions or spark.sparkContext.defaultParallelism
    span_refs = doc_media_refs(docs)
    refs_df = span_refs.select("media_ref").dropDuplicates(["media_ref"]).repartition(par)
    tiles = fused_decode_assign_pip(refs_df, polys).filter(F.col("status") == "ok")
    tiles = range_partition_by_cell(tiles, par, cell_col="s2_cell")
    # part_key = S2 PARENT prefix, not a hash (r4 review: pmod(xxhash64)
    # scattered each range-contiguous task across every partition dir —
    # up to par² small files, a wasted range shuffle, and resume that
    # skipped hash buckets instead of the documented cell ranges). The
    # parent level is sized so #cells ≈ par; parents are deterministic
    # across runs (resume-stable) and contiguous ranges map to contiguous
    # parents, so each range task writes ~1-2 partition dirs.
    import math

    from cog3pio_spark.functions import cells as C

    level = max(0, math.ceil(math.log(max(par, 6) / 6.0, 4)))
    tiles = tiles.withColumn("part_key", C.s2_parent(F.col("s2_cell"), level))
    ckpt = write_checkpointed(tiles.drop("hex_cells"), args.out, part_col="part_key")

    dt = time.perf_counter() - t0
    print(json.dumps({
        "polygons_with_tiles": len(agg_rows),
        "checkpoint": ckpt,
        "wall_sec": round(dt, 2),
    }))


if __name__ == "__main__":
    main()
