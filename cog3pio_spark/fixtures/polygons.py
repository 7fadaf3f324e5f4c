"""Seeded convex polygon layer for raster↔vector joins (FIXTURES.md §2).

Polygons live in the same projected plane as the COG fixtures (origin near the
reference's transform golden (499_980, 5_300_040) — src/io/geotiff.rs:396-399).
A handful overlap tile extents, some are disjoint. Vertices are continuous
jittered draws, so exact polygon-edge/tile-point contact is measure-zero —
PIP boundary behavior is pinned by dedicated unit tests, not by these
fixtures (verified r5: no interior-edge points at either gate sf). Schema:

    polygon_id STRING,
    ring  ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>,   -- closed, CCW, convex
    bbox  STRUCT<xmin,ymin,xmax,ymax: DOUBLE>
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def polygon_schema(with_holes: bool = False) -> T.StructType:
    pt = T.StructType([T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())])
    fields = [
        T.StructField("polygon_id", T.StringType(), False),
        T.StructField("ring", T.ArrayType(pt), False),
        T.StructField(
            "bbox",
            T.StructType(
                [
                    T.StructField("xmin", T.DoubleType()),
                    T.StructField("ymin", T.DoubleType()),
                    T.StructField("xmax", T.DoubleType()),
                    T.StructField("ymax", T.DoubleType()),
                ]
            ),
            False,
        ),
    ]
    if with_holes:
        # interior rings (each closed); even-odd PIP excludes their interiors
        fields.append(T.StructField("holes", T.ArrayType(T.ArrayType(pt)), True))
    return T.StructType(fields)


def make_polygon_rows(n: int = 16, seed: int = 42) -> list[tuple]:
    """Deterministic convex polygons: regular k-gons jittered by seeded rng.

    Centers sweep a jittered grid over [470k, 630k] × [5.18M, 5.42M] (the
    loop below is the source of truth); every 7th is deliberately far away
    (disjoint cases).
    """
    rng = np.random.RandomState(seed)
    rows = []
    # grid over the fixture extent [470k,630k]×[5.18M,5.42M] with jitter, so
    # polygon coverage of tile centroids is dense; every 7th is disjoint
    side = int(np.ceil(np.sqrt(n)))
    for i in range(n):
        if i % 7 == 6:  # disjoint polygon, far from all tiles
            cx, cy = 1_000_000.0 + i * 50_000.0, 4_000_000.0
        else:
            gx, gy = i % side, i // side
            cx = 470_000.0 + (gx + 0.5) * (160_000.0 / side) + float(rng.uniform(-9_000, 9_000))
            cy = 5_180_000.0 + (gy + 0.5) * (240_000.0 / side) + float(rng.uniform(-9_000, 9_000))
        k = 3 + (i % 5)  # triangle..heptagon
        radius = float(rng.uniform(18_000, 70_000))
        phase = float(rng.uniform(0, 2 * math.pi))
        ring = []
        for v in range(k):
            ang = phase + 2 * math.pi * v / k  # CCW
            ring.append((cx + radius * math.cos(ang), cy + radius * math.sin(ang)))
        ring.append(ring[0])  # closed
        xs, ys = [p[0] for p in ring], [p[1] for p in ring]
        rows.append(
            (
                f"poly{i:04d}",
                [{"x": x, "y": y} for x, y in ring],
                {"xmin": min(xs), "ymin": min(ys), "xmax": max(xs), "ymax": max(ys)},
            )
        )
    return rows


def polygons_df(spark: SparkSession, n: int = 16, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(make_polygon_rows(n, seed), polygon_schema())
