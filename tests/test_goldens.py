"""Committed golden DataFrames: recompute and two-way exceptAll compare
(FIXTURES.md §4 comparison contract)."""

from __future__ import annotations

import os

import pytest

from cog3pio_spark.operators.metrics import golden_compare

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "golden")


def _golden(spark, name):
    path = os.path.join(GOLDEN_DIR, name + ".parquet")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated (run tools/make_goldens.py)")
    return spark.read.parquet(path)


@pytest.mark.parametrize(
    "name,builder",
    [
        ("tile_assignments", "build_tile_assignments"),
        ("join_rows", "build_join_rows"),
        ("knn_results", "build_knn_results"),
    ],
)
def test_golden(spark, name, builder):
    import tools.make_goldens as G

    actual = getattr(G, builder)(spark)
    verdict = golden_compare(actual, _golden(spark, name))
    assert verdict["match"], verdict


def test_golden_dedupe_sf01_bounded(spark):
    """sf0.1 dedupe golden (VERDICT r2 #9): the capped/bucketed dedupe
    kernels must reproduce the committed pairs byte-for-byte AND finish
    inside a loose wall bound — a quadratic regression (uncapped bucket,
    all-pairs join) would blow straight through it."""
    import time

    import tools.make_goldens as G

    t0 = time.time()
    actual = G.build_dedupe_sf01(spark)
    verdict = golden_compare(actual, _golden(spark, "dedupe_sf01"))
    elapsed = time.time() - t0
    assert verdict["match"], verdict
    # loose bound: ~20 s nominal, 15x headroom for box load — a quadratic
    # regression (uncapped bucket / all-pairs join: >=(n/cap)^2 tasks) still
    # lands orders of magnitude past it
    assert elapsed < 300, f"dedupe golden took {elapsed:.0f}s — scale regression?"
