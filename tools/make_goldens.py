"""Generate the committed golden DataFrames (FIXTURES.md §4, SURVEY M4).

Goldens pin the engine's spatial semantics across refactors:
  tile_assignments — one row per valid fixture tile: cells + band stats
  join_rows        — (polygon × tile) PIP verdicts over the fixture layers
  knn_results      — k=5 ring-kNN over clustered seed points

Generators are seeded (tile farm/join layers seed 42, kNN seed points
seed 21) so regenerated VALUES are stable; byte-identity is NOT promised —
parquet part files carry fresh UUID names each run, and build_dedupe_sf01
pins outputs of the EXTERNAL sf0.1 corpus (SPARK_GRAFT_SF_DIR), so
regenerating against a different corpus pins different pairs (r5 doc fix).
tests/test_goldens.py recomputes and golden_compares values, not bytes.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

GOLDEN_DIR = os.path.join(HERE, "tests", "golden")


def build_tile_assignments(spark):
    from pyspark.sql import functions as F

    from cog3pio_spark.fixtures.cogs import ensure_fixtures
    from cog3pio_spark.operators.assign import assign_cells
    from cog3pio_spark.operators.decode import decode_tiles

    rows = ensure_fixtures()
    refs = spark.createDataFrame([(r["media_ref"],) for r in rows], ["media_ref"])
    decoded = decode_tiles(refs.dropDuplicates(["media_ref"]))
    tiles = assign_cells(decoded.filter(F.col("status") == "ok"))
    return tiles.select(
        # strip the machine-specific path prefix so goldens are portable
        F.regexp_extract("media_ref", r"([^/]+)$", 1).alias("tile"),  # basename: portable under COG3PIO_FIXTURE_DIR overrides (r5)
        "dtype", "bands", "height", "width",
        F.round("mean", 9).alias("mean"),
        "pixel_sha256", "s2_cell", "hex_cells",
        F.round("centroid_x", 6).alias("centroid_x"),
        F.round("centroid_y", 6).alias("centroid_y"),
    ).orderBy("tile")


def build_join_rows(spark):
    from pyspark.sql import functions as F

    from cog3pio_spark.fixtures.polygons import polygons_df
    from cog3pio_spark.operators.tile_kernel import fused_decode_assign_pip
    from cog3pio_spark.fixtures.cogs import ensure_fixtures

    rows = ensure_fixtures()
    refs = spark.createDataFrame(
        [(r["media_ref"],) for r in rows if r["valid"]], ["media_ref"]
    )
    out = fused_decode_assign_pip(refs, polygons_df(spark, 16))
    return out.select(
        F.regexp_extract("media_ref", r"([^/]+)$", 1).alias("tile"),  # basename: portable under COG3PIO_FIXTURE_DIR overrides (r5)
        "polygon_id", "s2_cell",
        F.col("polygon_id").isNotNull().alias("contained"),
    ).orderBy("tile", "polygon_id")


def build_knn_results(spark):
    import numpy as np

    from cog3pio_spark.operators.knn import knn_join

    rng = np.random.RandomState(21)
    pts = np.stack(
        [rng.normal(47.0, 0.08, 300), rng.normal(8.0, 0.08, 300)], axis=1
    )
    points = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(pts)],
        ["point_id", "lat", "lng"],
    )
    queries = spark.createDataFrame(
        [(j, float(pts[j * 29][0]), float(pts[j * 29][1])) for j in range(10)],
        ["query_id", "lat", "lng"],
    )
    from pyspark.sql import functions as F

    return knn_join(queries, points, k=5, res=6, ring=2).select(
        "query_id", "rank", "point_id", F.round("dist_m", 3).alias("dist_m")
    ).orderBy("query_id", "rank")


def build_dedupe_sf01(spark):
    """sf0.1 dedupe goldens under memory bounds (VERDICT r2 #9 / round-3
    candidate list): exact duplicate groups, MinHash-LSH near-dup pairs with
    a 256-row bucket cap, and simhash Hamming-6 pairs over the 5,000-doc
    driver table — one unified (op, key_a, key_b, metric) frame. Pins that
    the bucketed/capped scale shapes keep byte-identical outputs as the
    kernels evolve."""
    from pyspark.sql import functions as F

    from cog3pio_spark.operators.dedupe import (
        exact_dedupe,
        minhash_lsh_dupes,
        simhash_dupes,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    exact = (
        exact_dedupe(docs)
        .filter(F.col("n_copies") > 1)
        .select(
            F.lit("exact").alias("op"),
            F.col("doc_id").cast("string").alias("key_a"),
            F.lit("").alias("key_b"),
            F.col("n_copies").cast("double").alias("metric"),
        )
    )
    mh = minhash_lsh_dupes(docs, jaccard_threshold=0.5, bucket_cap=256).select(
        F.lit("minhash").alias("op"),
        F.col("id_a").cast("string").alias("key_a"),
        F.col("id_b").cast("string").alias("key_b"),
        F.col("jaccard_est").alias("metric"),
    )
    sh = simhash_dupes(docs, max_hamming=6).select(
        F.lit("simhash").alias("op"),
        F.col("id_a").cast("string").alias("key_a"),
        F.col("id_b").cast("string").alias("key_b"),
        F.col("hamming").cast("double").alias("metric"),
    )
    return exact.unionByName(mh).unionByName(sh).orderBy("op", "key_a", "key_b")


def main() -> None:
    from cog3pio_spark.session import get_spark

    spark = get_spark("make-goldens", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, builder in [
        ("tile_assignments", build_tile_assignments),
        ("join_rows", build_join_rows),
        ("knn_results", build_knn_results),
        ("dedupe_sf01", build_dedupe_sf01),
    ]:
        df = builder(spark).coalesce(1)
        path = os.path.join(GOLDEN_DIR, name + ".parquet")
        df.write.mode("overwrite").parquet(path)
        print(f"golden {name}: {spark.read.parquet(path).count()} rows → {path}")


if __name__ == "__main__":
    main()
