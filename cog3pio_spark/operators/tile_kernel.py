"""Fused tile kernel: decode → cell-assign → PIP verdict in ONE Arrow stage.

The modular operators (decode.py, assign.py, pip_join.py) each cross the
JVM↔Python boundary once; chained they cost 3-4 Python stage launches for a
tile branch whose data volume is tiny (distinct refs). This kernel fuses the
whole branch into a single ``mapInArrow`` pass — the hand-fused analogue of
whole-stage codegen for the Python side. The modular operators remain the
general-purpose API; plans/flagship.py uses the fused kernel.

Passthrough contract: every input column is carried to the output (Arrow
``take``), so callers can pipe pre-aggregated per-ref statistics (counts,
HLL sketches) straight through the kernel and aggregate the verdicts without
any downstream join — the flagship plan is scan → agg → kernel → agg, with
exactly one shuffle over the span table.

Output: one row per (input row, containing polygon); rows whose tile is in
no polygon get polygon_id NULL (so decode/assign results are never lost);
decode errors get status='error' with NULL geometry.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T

COMPUTED_FIELDS = [
    T.StructField("status", T.StringType(), False),
    T.StructField("dtype", T.StringType(), True),
    T.StructField("bands", T.IntegerType(), True),
    T.StructField("mean", T.DoubleType(), True),
    T.StructField("s2_cell", T.LongType(), True),
    T.StructField("hex_cells", T.ArrayType(T.LongType()), True),
    T.StructField("centroid_x", T.DoubleType(), True),
    T.StructField("centroid_y", T.DoubleType(), True),
    T.StructField("polygon_id", T.StringType(), True),
]


def fused_decode_assign_pip(
    refs: DataFrame,
    polygons: DataFrame,
    s2_level: int = 12,
    hex_lo: int = 5,
    hex_hi: int = 12,
    ref_col: str = "media_ref",
) -> DataFrame:
    """One-Python-stage tile branch over distinct-ref rows (+ passthrough)."""
    from cog3pio_spark.operators.pip_join import pack_polygons

    spark = refs.sparkSession
    bc = spark.sparkContext.broadcast(pack_polygons(polygons))

    in_schema = refs.schema
    out_schema = T.StructType(list(in_schema.fields) + COMPUTED_FIELDS)
    ref_idx = in_schema.fieldNames().index(ref_col)
    n_res = hex_hi - hex_lo + 1

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from cog3pio_spark.cells import h3x, s2
        from cog3pio_spark.functions.geo import EARTH_RADIUS_M
        from cog3pio_spark.operators.decode import _decode_one
        from cog3pio_spark.operators.pip_join import _pip_candidates

        pack = bc.value
        for batch in batches:
            refs_list = batch.column(ref_idx).to_pylist()
            n = len(refs_list)
            if n == 0:
                continue
            decoded = [_decode_one(r, include_pixels=False) for r in refs_list]
            # np.isfinite, not `is not None` (r5 review): a NaN centroid
            # (NaN affine tags on an otherwise-ok decode) through the int
            # cell cast makes VALID-LOOKING s2/hex ids — the exact class
            # _coords_or_null nulls in the modular path
            geo = np.array(
                [
                    d["status"] == "ok"
                    and d["centroid_x"] is not None
                    and np.isfinite(d["centroid_x"])
                    and d["centroid_y"] is not None
                    and np.isfinite(d["centroid_y"])
                    for d in decoded
                ]
            )
            cx = np.array(
                [d["centroid_x"] if g else np.nan for d, g in zip(decoded, geo)]
            )
            cy = np.array(
                [d["centroid_y"] if g else np.nan for d, g in zip(decoded, geo)]
            )
            s2c = np.zeros(n, dtype=np.int64)
            hexes = np.zeros((n, n_res), dtype=np.int64)
            if geo.any():
                lat = np.degrees(cy[geo] / EARTH_RADIUS_M)
                lng = np.degrees(cx[geo] / EARTH_RADIUS_M)
                s2c[geo] = s2.to_signed(s2.latlng_to_cell(lat, lng, s2_level))
                # one projection for ALL resolutions (r5 review: the loop
                # redid the lat→xyz→face trig 8× — the modular path already
                # switched to the multi-res helper in r4, the fused kernel
                # is the flagship's actual hot tile stage)
                hexes[geo] = h3x.latlng_to_cells_multi(
                    lat, lng, list(range(hex_lo, hex_hi + 1))
                )
            pt_idx, pg_idx = _pip_candidates(cx, cy, pack)  # NaN rows never match

            by_row: dict[int, list[int]] = {}
            for pi, gi in zip(pt_idx.tolist(), pg_idx.tolist()):
                by_row.setdefault(pi, []).append(gi)
            rows_out: list[int] = []
            poly_out: list[str | None] = []
            for i in range(n):
                hits = by_row.get(i)
                if not hits:
                    rows_out.append(i)
                    poly_out.append(None)
                else:
                    for gi in hits:
                        rows_out.append(i)
                        poly_out.append(str(pack["ids"][gi]))

            take = pa.array(rows_out, type=pa.int64())
            cols = [batch.column(i).take(take) for i in range(batch.num_columns)]
            d_at = lambda key, typ: pa.array(  # noqa: E731
                [decoded[i][key] for i in rows_out], type=typ
            )
            cols.append(d_at("status", pa.string()))
            cols.append(d_at("dtype", pa.string()))
            cols.append(d_at("bands", pa.int32()))
            cols.append(d_at("mean", pa.float64()))
            cols.append(
                pa.array(
                    [int(s2c[i]) if geo[i] else None for i in rows_out], pa.int64()
                )
            )
            cols.append(
                pa.array(
                    [hexes[i].tolist() if geo[i] else None for i in rows_out],
                    pa.list_(pa.int64()),
                )
            )
            cols.append(d_at("centroid_x", pa.float64()))
            cols.append(d_at("centroid_y", pa.float64()))
            cols.append(pa.array(poly_out, pa.string()))
            yield pa.RecordBatch.from_arrays(
                cols, names=[*batch.schema.names, *[f.name for f in COMPUTED_FIELDS]]
            )

    return refs.mapInArrow(kernel, out_schema)
