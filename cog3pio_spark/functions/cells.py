"""Vectorized pandas_udf wrappers over the numpy cell-index kernels.

Each UDF receives whole Arrow batches as pandas Series and runs pure numpy —
the plan shows ``ArrowEvalPython``, never ``BatchEvalPython`` (enforced by
tests/test_pipeline.py).

Id carrier: Spark LongType via the uint64→int64 bit view. Faces 4 and 5 set
bit 63, so signed ordering permutes the *face blocks* (4,5 sort before 0..3)
— but every S2 cell range [range_min, range_max] lies within one face, where
the signed view is strictly monotone. BETWEEN predicates, range joins and
range partitioning therefore stay correct; only cross-face global order is
cosmetic, which nothing relies on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from cog3pio_spark.cells import h3x as _h3x
from cog3pio_spark.cells import s2 as _s2


def _coords_or_null(la: pd.Series, ln: pd.Series):
    """(lat, lng, null_mask): Arrow delivers null doubles as NaN, and a NaN
    fed to the int casts inside the cell kernels produced a VALID-LOOKING
    cell id (platform-dependent, clipped to a face corner) — null
    coordinates must come out as null cells, never as a real spatial key
    (r4 review: null-centroid rows silently joined into face-2's corner)."""
    lat_np = la.to_numpy(np.float64)
    lng_np = ln.to_numpy(np.float64)
    mask = np.isnan(lat_np) | np.isnan(lng_np)
    if mask.any():
        lat_np = np.where(mask, 0.0, lat_np)
        lng_np = np.where(mask, 0.0, lng_np)
    return lat_np, lng_np, mask


def s2_cell(lat: Column, lng: Column, level: int) -> Column:
    @pandas_udf(T.LongType())
    def _u(la: pd.Series, ln: pd.Series) -> pd.Series:
        lat_np, lng_np, mask = _coords_or_null(la, ln)
        ids = _s2.to_signed(_s2.latlng_to_cell(lat_np, lng_np, level))
        if mask.any():
            return pd.Series(ids).astype("Int64").mask(mask)
        return pd.Series(ids)

    return _u(lat, lng)


def s2_range_min(cell: Column) -> Column:
    @pandas_udf(T.LongType())
    def _u(c: pd.Series) -> pd.Series:
        return pd.Series(_s2.to_signed(_s2.range_min(_s2.from_signed(c.to_numpy(np.int64)))))

    return _u(cell)


def s2_range_max(cell: Column) -> Column:
    @pandas_udf(T.LongType())
    def _u(c: pd.Series) -> pd.Series:
        return pd.Series(_s2.to_signed(_s2.range_max(_s2.from_signed(c.to_numpy(np.int64)))))

    return _u(cell)


def s2_parent(cell: Column, level: int) -> Column:
    @pandas_udf(T.LongType())
    def _u(c: pd.Series) -> pd.Series:
        return pd.Series(
            _s2.to_signed(_s2.parent(_s2.from_signed(c.to_numpy(np.int64)), level))
        )

    return _u(cell)


def h3x_cell(lat: Column, lng: Column, res: int) -> Column:
    @pandas_udf(T.LongType())
    def _u(la: pd.Series, ln: pd.Series) -> pd.Series:
        lat_np, lng_np, mask = _coords_or_null(la, ln)
        ids = _h3x.latlng_to_cell(lat_np, lng_np, res)
        if mask.any():
            return pd.Series(ids).astype("Int64").mask(mask)
        return pd.Series(ids)

    return _u(lat, lng)


def h3x_parent(cell: Column, res: int) -> Column:
    @pandas_udf(T.LongType())
    def _u(c: pd.Series) -> pd.Series:
        return pd.Series(_h3x.parent(c.to_numpy(np.int64), res))

    return _u(cell)


def h3x_resolution(cell: Column) -> Column:
    """Resolution of a packed hex cell id (r5: needed by invariant queries
    that group a mixed-resolution compacted set before parent() calls,
    which require uniform-resolution input)."""

    @pandas_udf(T.IntegerType())
    def _u(c: pd.Series) -> pd.Series:
        return pd.Series(_h3x.resolution(c.to_numpy(np.int64)).astype(np.int32))

    return _u(cell)


def h3x_kring(cell: Column, k: int) -> Column:
    """ARRAY<BIGINT> of all cells within hex distance ≤ k (for explode+join)."""

    @pandas_udf(T.ArrayType(T.LongType()))
    def _u(c: pd.Series) -> pd.Series:
        ring = _h3x.k_ring(c.to_numpy(np.int64), k)  # (n, 3k(k+1)+1)
        return pd.Series(list(ring))

    return _u(cell)


def h3x_multi_res(lat: Column, lng: Column, res_lo: int = 5, res_hi: int = 12) -> Column:
    """ARRAY<BIGINT> of hex cells for res_lo..res_hi (pre-compaction)."""

    @pandas_udf(T.ArrayType(T.LongType()))
    def _u(la: pd.Series, ln: pd.Series) -> pd.Series:
        lat_np, lng_np, mask = _coords_or_null(la, ln)
        # one projection for ALL resolutions: face/(u,v) are
        # resolution-invariant, so the lat→xyz→face trig runs once and only
        # the per-res lattice transform repeats (r4 review: the hottest
        # per-tile path redid the projection 8x)
        stacked = _h3x.latlng_to_cells_multi(
            lat_np, lng_np, list(range(res_lo, res_hi + 1))
        )
        out: list = list(stacked)
        if mask.any():
            for i in np.nonzero(mask)[0]:
                out[i] = None
        return pd.Series(out, dtype=object)

    return _u(lat, lng)
