"""Affine georeferencing + fixture CRS as pure Catalyst column math.

The affine contract mirrors the reference Transform trait
(/root/reference/src/traits.rs:11-43, impl src/io/geotiff.rs:117-178):
pixel→world with pixel-center offset (+0.5), y-scale negative (north-up),
coordinate axes as half-open length-n sequences.

Being plain column arithmetic, these stay inside WholeStageCodegen — no
Python boundary at all (verified in tests by asserting no BatchEvalPython
nodes in the plan).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixture CRS: plate carrée on the WGS84 sphere (world equidistant
# cylindrical, EPSG:4087-style). Deterministic + invertible; documented as
# the engine's fixture projection (FIXTURES.md §2 coords are meters).
EARTH_RADIUS_M = 6378137.0


def affine_world_x(a, b, c, col, row) -> Column:
    """x_world = a*(col+0.5) + b*(row+0.5) + c   (pixel-center)."""
    return a * (col + F.lit(0.5)) + b * (row + F.lit(0.5)) + c


def affine_world_y(d, e, f, col, row) -> Column:
    """y_world = d*(col+0.5) + e*(row+0.5) + f   (pixel-center, e<0)."""
    return d * (col + F.lit(0.5)) + e * (row + F.lit(0.5)) + f


def x_coords_expr(a, c, width) -> Column:
    """Half-open pixel-center x-axis as ARRAY<DOUBLE> of length ``width``.

    Equals np.linspace(c + a/2, c + a/2 + a*w, w, endpoint=False) — the
    reference golden (python/tests/test_io_geotiff.py:141-169).
    """
    # width=0 guard (r4 review): sequence(0, -1) infers step -1 and emits
    # [0, -1] — two bogus coordinates instead of the documented empty axis.
    # NULL width must yield NULL, not a valid-looking empty axis (r6 review:
    # a bare otherwise() swallowed NULL > 0's NULL into the empty branch) —
    # both whens skip on NULL, so the expression falls through to NULL.
    return F.when(
        width.cast("int") > 0,
        F.transform(
            F.sequence(F.lit(0), width.cast("int") - 1),
            lambda i: c + a * (i.cast("double") + F.lit(0.5)),
        ),
    ).when(width.cast("int") <= 0, F.array().cast("array<double>"))


def y_coords_expr(e, f, height) -> Column:
    """Half-open pixel-center y-axis (descending when e<0).

    NULL height yields NULL, not an empty axis (see x_coords_expr)."""
    return F.when(
        height.cast("int") > 0,
        F.transform(
            F.sequence(F.lit(0), height.cast("int") - 1),
            lambda i: f + e * (i.cast("double") + F.lit(0.5)),
        ),
    ).when(height.cast("int") <= 0, F.array().cast("array<double>"))


def world_to_lat(y_m) -> Column:
    return F.degrees(y_m / F.lit(EARTH_RADIUS_M))


def world_to_lng(x_m) -> Column:
    return F.degrees(x_m / F.lit(EARTH_RADIUS_M))
