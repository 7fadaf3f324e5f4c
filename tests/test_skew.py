"""Skew handling: salting mechanics + AQE skew-join split, verified from the
executed plan / group sizes rather than vibes (SURVEY §7 hard-part 3)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_salting_bounds_bucket_size(spark):
    """Zipf-hot key: salted (key, salt) buckets are ≤ ~hot/n_salt."""
    n, n_salt = 200_000, 8
    # 40% of rows share one hot key, rest uniform over 1000 keys
    df = spark.range(n).select(
        F.when(F.col("id") % 5 < 2, F.lit(7)).otherwise(F.pmod(F.xxhash64("id"), 1000)).alias("key"),
        F.col("id"),
    )
    unsalted_max = (
        df.groupBy("key").count().agg(F.max("count")).collect()[0][0]
    )
    salted = df.withColumn("salt", F.pmod(F.xxhash64("id"), F.lit(n_salt)))
    salted_max = (
        salted.groupBy("key", "salt").count().agg(F.max("count")).collect()[0][0]
    )
    assert unsalted_max >= 0.39 * n
    assert salted_max <= unsalted_max / n_salt * 1.25


def test_aqe_skew_join_split_fires(spark):
    """AQE marks the sort-merge join 'isSkew=true' on a Zipf-skewed join
    when the skewed partition exceeds the (lowered) thresholds."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(300_000).select(
            F.when(F.col("id") % 3 < 2, F.lit(1)).otherwise(
                F.pmod(F.xxhash64("id"), 50)
            ).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pay"),
        )
        right = spark.range(200).select(
            F.pmod(F.col("id"), 50).alias("k"), F.col("id").alias("rid")
        )
        joined = left.join(right, "k")
        # execute THIS DataFrame's QueryExecution (count() would spawn a
        # different one whose AQE plan we can't inspect)
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isSkew=true" in plan or "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_range_join_handles_zipf_probe(spark):
    """cell_prefix_range_join correctness is independent of probe skew."""
    from cog3pio_spark.cells import s2
    from cog3pio_spark.operators.range_join import cell_prefix_range_join

    rng = np.random.RandomState(3)
    # 70% of points in one small hot region, rest global
    hot = np.stack([rng.normal(47, 0.01, 7000), rng.normal(8, 0.01, 7000)], 1)
    cold = np.stack([rng.uniform(-60, 60, 3000), rng.uniform(-170, 170, 3000)], 1)
    pts = np.concatenate([hot, cold])
    cells = s2.to_signed(s2.latlng_to_cell(pts[:, 0], pts[:, 1], 12))
    probe = spark.createDataFrame([(int(c),) for c in cells], ["s2_cell"])

    anchor = s2.parent(s2.latlng_to_cell(np.array([47.0]), np.array([8.0]), 12), 7)
    ranges = spark.createDataFrame(
        [(0, int(s2.to_signed(s2.range_min(anchor))[0]), int(s2.to_signed(s2.range_max(anchor))[0]))],
        ["range_id", "range_lo", "range_hi"],
    )
    got = cell_prefix_range_join(probe, ranges, prefix_level=5, n_salt=8).count()
    want = probe.filter(
        (F.col("s2_cell") >= int(s2.to_signed(s2.range_min(anchor))[0]))
        & (F.col("s2_cell") <= int(s2.to_signed(s2.range_max(anchor))[0]))
    ).count()
    assert got == want and want >= 7000  # hot region fully matched


def test_range_join_cross_face_sign_flip(spark):
    """A build range spanning the face 3|4 boundary flips sign in the signed
    int64 carrier (lo > hi). The operator must split it and still match every
    probe cell in the unsigned interval (ADVICE r1: sequence() with positive
    stride would throw or silently drop matches)."""
    from cog3pio_spark.cells import s2
    from cog3pio_spark.operators.range_join import cell_prefix_range_join

    rng = np.random.RandomState(5)
    pts = np.stack([rng.uniform(-60, 60, 4000), rng.uniform(-180, 180, 4000)], 1)
    cells_u = s2.latlng_to_cell(pts[:, 0], pts[:, 1], 12)
    cells = s2.to_signed(cells_u)
    probe = spark.createDataFrame([(int(c),) for c in cells], ["s2_cell"])

    # range from a face-3 anchor to a face-4 anchor: unsigned lo < hi but
    # signed lo > 0 > hi (the sign flip)
    a3 = s2.parent(s2.latlng_to_cell(np.array([0.0]), np.array([170.0]), 12), 7)
    a4 = s2.parent(s2.latlng_to_cell(np.array([0.0]), np.array([-100.0]), 12), 7)
    lo_u, hi_u = int(s2.range_min(a3)[0]), int(s2.range_max(a4)[0])
    assert lo_u < hi_u  # unsigned interval is well-formed
    lo, hi = int(s2.to_signed(np.array([lo_u], dtype=np.uint64))[0]), int(
        s2.to_signed(np.array([hi_u], dtype=np.uint64))[0]
    )
    assert lo > 0 > hi  # the sign flip the split must handle
    ranges = spark.createDataFrame([(0, lo, hi)], ["range_id", "range_lo", "range_hi"])
    got = cell_prefix_range_join(probe, ranges, prefix_level=5, n_salt=4).count()
    want = int(((cells_u >= np.uint64(lo_u)) & (cells_u <= np.uint64(hi_u))).sum())
    assert want > 0
    assert got == want
