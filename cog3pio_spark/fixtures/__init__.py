"""Deterministic, seeded fixture generators (no network, no wall-clock).

* ``cogs``     — synthetic GeoTIFF matrix mirroring the reference tests.
* ``docs``     — interleaved text+media documents table (BASELINE input_hint).
* ``polygons`` — convex polygon layer for raster↔vector joins.
"""
