"""Broadcast point-in-polygon join (raster↔vector stage, SURVEY §2.B joins).

Containment is a theta predicate — no equi-key exists — so Catalyst's only
native plan would be a broadcast-nested-loop join with a per-row UDF (slow
path). Instead the polygon layer (small dim side: thousands, not billions)
is packed into flat numpy arrays on the driver, broadcast once via
``sc.broadcast``, and probed inside a ``mapInArrow`` stage:

* bbox prefilter: one vectorized (points × polygons) interval test — the
  numpy analogue of an STRtree sweep; for ≤ ~10^4 polygons a dense bbox mask
  beats tree traversal in vectorized form (no per-node Python);
* exact test: convex CCW rings ⇒ all-edges cross-product sign test,
  vectorized over candidate pairs.

The probe is shuffle-free: tiles stream through map tasks; only the
(tiny) polygon pack moves, once per executor. At 1000 executors × 100 TB of
tiles this is the only join shape that avoids shuffling the big side.

Output: inner-join rows (point row + polygon_id), plus ``contained`` flag
variant for golden tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def pack_polygons(polygons: DataFrame) -> dict:
    """Collect + pack the polygon layer into flat numpy arrays (driver-side).

    Pack layout: ids list, ring vertex arrays (concatenated) + offsets, bbox
    arrays — a serialized 'STRtree-lite' suitable for a Spark broadcast.
    """
    rows = polygons.select("polygon_id", "ring", "bbox").collect()
    ids, xs, ys, offs = [], [], [], [0]
    bxmin, bymin, bxmax, bymax = [], [], [], []
    for r in rows:
        ids.append(r["polygon_id"])
        ring = r["ring"]
        xs.extend(p["x"] for p in ring)
        ys.extend(p["y"] for p in ring)
        offs.append(len(xs))
        bxmin.append(r["bbox"]["xmin"])
        bymin.append(r["bbox"]["ymin"])
        bxmax.append(r["bbox"]["xmax"])
        bymax.append(r["bbox"]["ymax"])
    return {
        "ids": np.array(ids),
        "x": np.array(xs, np.float64),
        "y": np.array(ys, np.float64),
        "offs": np.array(offs, np.int64),
        "bxmin": np.array(bxmin, np.float64),
        "bymin": np.array(bymin, np.float64),
        "bxmax": np.array(bxmax, np.float64),
        "bymax": np.array(bymax, np.float64),
    }


def _pip_candidates(px: np.ndarray, py: np.ndarray, pack: dict):
    """Return (point_idx, poly_idx) pairs passing bbox + exact convex PIP."""
    # bbox mask: (n_points, n_polys) — vectorized sweep
    m = (
        (px[:, None] >= pack["bxmin"][None, :])
        & (px[:, None] <= pack["bxmax"][None, :])
        & (py[:, None] >= pack["bymin"][None, :])
        & (py[:, None] <= pack["bymax"][None, :])
    )
    pt_idx, pg_idx = np.nonzero(m)
    if len(pt_idx) == 0:
        return pt_idx, pg_idx
    keep = np.zeros(len(pt_idx), dtype=bool)
    # exact test grouped by polygon (few polygons ⇒ few iterations,
    # each fully vectorized over that polygon's candidate points)
    for pg in np.unique(pg_idx):
        sel = pg_idx == pg
        cx, cy = px[pt_idx[sel]], py[pt_idx[sel]]
        s, e = pack["offs"][pg], pack["offs"][pg + 1]
        vx, vy = pack["x"][s:e], pack["y"][s:e]
        # ring is closed: edges (v[i], v[i+1]); CCW ⇒ inside = all cross ≥ 0
        ex, ey = np.diff(vx), np.diff(vy)
        cross = ex[None, :] * (cy[:, None] - vy[None, :-1]) - ey[None, :] * (
            cx[:, None] - vx[None, :-1]
        )
        keep[sel] = np.all(cross >= 0.0, axis=1)
    return pt_idx[keep], pg_idx[keep]


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    x_col: str = "centroid_x",
    y_col: str = "centroid_y",
) -> DataFrame:
    """Inner join: one output row per (point, containing polygon).

    Points on a polygon edge count as contained (cross == 0 allowed) —
    pinned by the boundary-case fixtures.
    """
    spark = points.sparkSession
    pack = pack_polygons(polygons)
    bc = spark.sparkContext.broadcast(pack)

    in_schema = points.schema
    out_schema = T.StructType(in_schema.fields + [T.StructField("polygon_id", T.StringType(), False)])
    xi = in_schema.fieldNames().index(x_col)
    yi = in_schema.fieldNames().index(y_col)

    def probe(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pk = bc.value
        for batch in batches:
            px = batch.column(xi).to_numpy(zero_copy_only=False).astype(np.float64)
            py = batch.column(yi).to_numpy(zero_copy_only=False).astype(np.float64)
            pt_idx, pg_idx = _pip_candidates(px, py, pk)
            if len(pt_idx) == 0:
                continue
            take = pa.array(pt_idx, type=pa.int64())
            cols = [batch.column(i).take(take) for i in range(batch.num_columns)]
            cols.append(pa.array(pk["ids"][pg_idx].tolist(), type=pa.string()))
            yield pa.RecordBatch.from_arrays(
                cols, names=[*batch.schema.names, "polygon_id"]
            )

    return points.mapInArrow(probe, out_schema)
