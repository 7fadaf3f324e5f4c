"""partition_metrics (mapInPandas) + golden_compare + pyramid decode."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cog3pio_spark.operators.metrics import golden_compare, partition_metrics


def test_partition_metrics_ranges(spark):
    df = spark.range(1000).select(F.col("id").alias("k")).repartitionByRange(4, "k")
    m = partition_metrics(df, key_col="k").collect()
    assert sum(r["n_rows"] for r in m) == 1000
    # range partitioning ⇒ per-partition key ranges are disjoint
    spans = sorted((int(r["key_lo"]), int(r["key_hi"])) for r in m if r["n_rows"])
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2


def test_golden_compare(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"])
    b = spark.createDataFrame([(2, "y"), (1, "x")], ["id", "v"])  # reordered
    assert golden_compare(a, b)["match"]
    c = spark.createDataFrame([(1, "x"), (3, "z")], ["id", "v"])
    v = golden_compare(a, c)
    assert not v["match"] and v["missing_rows"] == 1 and v["extra_rows"] == 1
    d = spark.createDataFrame([(1,)], ["other"])
    assert not golden_compare(a, d)["match"]


class TestPyramid:
    """COG overview chain (engine extension beyond first-IFD reference)."""

    @pytest.fixture(scope="class")
    def pyr_path(self, tmp_path_factory):
        from cog3pio_spark.tiff.writer import write_tiff

        rng = np.random.RandomState(1)
        arr = (rng.rand(1, 64, 48) * 100).astype(np.float32)
        p = str(tmp_path_factory.mktemp("pyr") / "pyr.tif")
        write_tiff(p, arr, overviews=3, tiled=True, tile_size=16,
                   compression="deflate", pixel_scale=(10.0, 10.0),
                   tiepoint=(0, 0, 0, 500000.0, 5300000.0, 0))
        return p, arr

    def test_levels_decode(self, pyr_path):
        from cog3pio_spark.tiff.reader import CogReader

        p, arr = pyr_path
        buf = open(p, "rb").read()
        r = CogReader(buf)
        assert r.num_images == 4
        np.testing.assert_array_equal(r.to_numpy(), arr)
        lvl1 = CogReader(buf, image_index=1)
        np.testing.assert_array_equal(lvl1.to_numpy(), arr[:, ::2, ::2])
        assert lvl1.transform().a == 20.0  # overview pixel scale doubles

    def test_overview_pushdown_in_decode_operator(self, spark, pyr_path):
        from cog3pio_spark.operators.decode import decode_tiles

        p, arr = pyr_path
        refs = spark.createDataFrame([("file://" + p,)], ["media_ref"])
        full = decode_tiles(refs).collect()[0]
        ov2 = decode_tiles(refs, overview=2).collect()[0]
        assert (full["height"], full["width"]) == (64, 48)
        assert (ov2["height"], ov2["width"]) == (16, 12)
        ov9 = decode_tiles(refs, overview=9).collect()[0]  # clamps to deepest
        assert ov9["height"] == 8

    def test_index_out_of_range(self, pyr_path):
        from cog3pio_spark.tiff.reader import CogReader, TiffDecodeError

        p, _ = pyr_path
        with pytest.raises(TiffDecodeError, match="out of range"):
            CogReader(open(p, "rb").read(), image_index=4)


def test_partition_metrics_includes_empty_partitions(spark):
    """r4 review: the groupBy(spark_partition_id) shape emitted NO row for
    empty partitions — hiding exactly the imbalance signal this function
    exists to surface. mapInPandas emits one row per physical partition."""
    df = spark.range(10).repartition(8)  # some partitions may be empty; force:
    skewed = spark.createDataFrame([(1,)] * 20, ["v"]).repartition(6, "v")
    m = {r["partition_id"]: r["n_rows"] for r in partition_metrics(skewed).collect()}
    assert len(m) == 6  # EVERY partition reports, empty ones included
    assert sum(m.values()) == 20
    assert 0 in set(m.values())  # the skew put everything on one partition


def test_partition_metrics_null_key_batches(spark):
    """r5 review: an all-NULL key batch made pandas .min() return float NaN,
    which raised TypeError against a later string batch (or silently
    reported 'nan' ranges for numeric keys). NULL batches must simply not
    contribute to the range."""
    rows = [(None, i) for i in range(50)] + [("k%02d" % i, i) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, v long").coalesce(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    try:
        m = partition_metrics(df, key_col="k").collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert len(m) == 1
    assert m[0]["n_rows"] == 100
    assert m[0]["key_lo"] == "k00" and m[0]["key_hi"] == "k49"

    all_null = spark.createDataFrame([(None, 1), (None, 2)], "k string, v long")
    m2 = partition_metrics(all_null.coalesce(1), key_col="k").collect()
    assert m2[0]["key_lo"] is None and m2[0]["key_hi"] is None
