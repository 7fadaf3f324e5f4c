"""kNN: ring join must equal brute force where the ring covers k-NN."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cog3pio_spark.operators.knn import knn_brute, knn_join


@pytest.fixture(scope="module")
def clustered(spark):
    """Dense clustered points: k-th NN well inside one res-6 cell ring."""
    rng = np.random.RandomState(21)
    centers = [(47.0, 8.0), (47.3, 8.4), (46.8, 7.9)]
    pts = []
    for cx, cy in centers:
        pts.append(
            np.stack(
                [rng.normal(cx, 0.05, 200), rng.normal(cy, 0.05, 200)], axis=1
            )
        )
    pts = np.concatenate(pts)
    points = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(pts)],
        ["point_id", "lat", "lng"],
    )
    queries = spark.createDataFrame(
        [(j, float(pts[j * 37][0]), float(pts[j * 37][1])) for j in range(12)],
        ["query_id", "lat", "lng"],
    )
    return queries, points


def test_ring_knn_matches_brute(clustered):
    queries, points = clustered
    ring = knn_join(queries, points, k=5, res=6, ring=2)
    brute = knn_brute(queries, points, k=5)
    a = {(r["query_id"], r["rank"], r["point_id"]) for r in ring.collect()}
    b = {(r["query_id"], r["rank"], r["point_id"]) for r in brute.collect()}
    assert a == b
    assert len(a) == 12 * 5


def test_exactness_certificate_is_sound(spark, clustered):
    """Certified-exact queries must match brute force (no false positives);
    clustered data should certify most queries."""
    queries, points = clustered
    cert = knn_join(queries, points, k=5, res=6, ring=2, with_certificate=True)
    rows = cert.collect()
    brute = {
        (r["query_id"], r["rank"]): r["point_id"]
        for r in knn_brute(queries, points, k=5).collect()
    }
    certified = [r for r in rows if r["exact"]]
    assert certified, "no query certified on dense clustered data"
    for r in certified:
        assert brute[(r["query_id"], r["rank"])] == r["point_id"]
    # adversarial: far-away query in an empty region → brute fallback path,
    # still certified (exact by construction)
    far = spark.createDataFrame([(999, -40.0, 100.0)], ["query_id", "lat", "lng"])
    fr = knn_join(far, points, k=2, res=6, ring=1, with_certificate=True).collect()
    assert all(r["exact"] for r in fr)


def test_sort_merge_knn_recall(clustered):
    """Curve-order kNN: high recall vs brute force on clustered data."""
    from cog3pio_spark.operators.knn import knn_sort_merge

    queries, points = clustered
    sm = knn_sort_merge(queries, points, k=5, scan_width=96)
    brute = knn_brute(queries, points, k=5)
    a = {(r["query_id"], r["point_id"]) for r in sm.collect()}
    b = {(r["query_id"], r["point_id"]) for r in brute.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.9, recall


def test_sparse_queries_fall_back(spark, clustered):
    _, points = clustered
    # a query far from every cluster → phase-1 ring finds nothing → fallback
    faraway = spark.createDataFrame([(99, -30.0, 120.0)], ["query_id", "lat", "lng"])
    out = knn_join(faraway, points, k=3, res=6, ring=1).collect()
    assert len(out) == 3
    brute = knn_brute(faraway, points, k=3).collect()
    assert {(r["rank"], r["point_id"]) for r in out} == {
        (r["rank"], r["point_id"]) for r in brute
    }
