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


def test_exactness_certificate_sound_at_face_edge(spark):
    """A query hugging the cube-face edge (lng=45 between S2 faces 0/1) whose
    TRUE nearest neighbors lie just across the edge: k-rings truncate at face
    boundaries, so the ring join only sees same-face points. Pre-fix the
    certificate bound ignored the edge and certified the wrong rows; the
    edge-capped bound must leave this query uncertified (or certified AND
    matching brute force)."""
    # measured at res 6 near lng=45: un-capped ring bound = 751 m, so the
    # same-face kth (~445 m) certifies pre-fix; the cross-face points are
    # closer (239..306 m) and invisible to the truncated k-ring.
    query = spark.createDataFrame([(1, 0.0, 44.998)], ["query_id", "lat", "lng"])
    pts = []
    # 5 same-face points, 222..445 m west — inside ring-2 coverage
    for i in range(1, 6):
        pts.append((100 + i, 0.0, 44.998 - 0.002 - 0.0005 * (i - 1)))
    # 5 cross-face points, just across lng=45 — closer than same-face ranks 2+
    for i in range(1, 6):
        pts.append((200 + i, 0.0, 45.0 + 0.00015 * i))
    points = spark.createDataFrame(pts, ["point_id", "lat", "lng"])
    cert = knn_join(query, points, k=5, res=6, ring=2, with_certificate=True)
    rows = cert.collect()
    brute = {
        (r["query_id"], r["rank"]): r["point_id"]
        for r in knn_brute(query, points, k=5).collect()
    }
    for r in rows:
        if r["exact"]:
            assert brute[(r["query_id"], r["rank"])] == r["point_id"], (
                "false certificate at face edge: certified row disagrees "
                f"with brute force ({r})"
            )


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


def test_sort_merge_partitioned_equals_single_bucket(clustered):
    """Ghost-row boundary duplication: bucketed execution must produce the
    IDENTICAL result as one global bucket (VERDICT r1 fix #2)."""
    from cog3pio_spark.operators.knn import knn_sort_merge

    queries, points = clustered
    one = knn_sort_merge(queries, points, k=5, scan_width=32, num_buckets=1)
    many = knn_sort_merge(queries, points, k=5, scan_width=32, num_buckets=4)
    a = {(r["query_id"], r["rank"], r["point_id"]) for r in one.collect()}
    b = {(r["query_id"], r["rank"], r["point_id"]) for r in many.collect()}
    assert a == b
    assert len(b) == 12 * 5


def test_sort_merge_stat_hints_skip_jobs_same_output(clustered):
    """VERDICT r2 #4: callers with table stats pass total_rows=/cuts= and the
    operator must (a) produce the identical result and (b) run neither the
    count nor the approxQuantile preparatory job when cuts are supplied."""
    from unittest import mock

    from cog3pio_spark.operators.knn import knn_sort_merge

    queries, points = clustered
    base = knn_sort_merge(queries, points, k=5, scan_width=32, num_buckets=4)
    a = {(r["query_id"], r["rank"], r["point_id"]) for r in base.collect()}

    # derive the same cuts the stat path would compute, then supply them
    total = queries.count() + points.count()
    hinted = knn_sort_merge(
        queries, points, k=5, scan_width=32, num_buckets=4, total_rows=total
    )
    b = {(r["query_id"], r["rank"], r["point_id"]) for r in hinted.collect()}
    assert a == b

    # unbalanced cuts whose interior buckets still hold >= scan_width rows
    # (or are edge-empty) stay CORRECT — ghosts repair adjacent boundaries;
    # a THIN MIDDLE bucket would shrink frames (documented precondition).
    # With cuts supplied, count/approxQuantile are never called.
    with mock.patch.object(
        type(queries), "count", side_effect=AssertionError("count() called despite cuts hint")
    ):
        cut_run = knn_sort_merge(
            queries, points, k=5, scan_width=32, cuts=[0, 1 << 61]
        )
        c = {(r["query_id"], r["rank"], r["point_id"]) for r in cut_run.collect()}
    assert a == c


def test_sort_merge_kernel_not_single_partition(clustered):
    """The neighborhood scan must run per-bucket — no global single-task
    Exchange SinglePartition feeding it (the round-1 scale-killer). r6: the
    neighborhood is a FlatMapGroupsInPandas kernel grouped by _bucket, so
    the guard pins that node and its grouping exchange rather than the
    removed rowsBetween window (the surviving top-k rank Window partitions
    by query_id and would satisfy a bare 'Window' check vacuously)."""
    from cog3pio_spark.operators.knn import knn_sort_merge

    queries, points = clustered
    sm = knn_sort_merge(queries, points, k=5, scan_width=32, num_buckets=4)
    sm.collect()
    plan = sm._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    # the kernel's grouping exchange must hash-partition by _bucket, and no
    # SinglePartition exchange may sit near the kernel or any window
    for i, line in enumerate(plan.splitlines()):
        if "SinglePartition" in line:
            ctx = "\n".join(plan.splitlines()[max(0, i - 3): i + 3])
            assert "Window" not in ctx, f"single-partition window:\n{ctx}"
            assert "FlatMapGroupsInPandas" not in ctx, (
                f"single-partition kernel:\n{ctx}"
            )


def test_sort_merge_nan_coord_does_not_corrupt_bucket(spark, clustered):
    """A NaN-coord point gets a NULL curve key (the r5 NaN-cells fix); one
    such row would make Arrow deliver its whole bucket's _cell batch as
    float64, silently rounding every level-30 carrier in the bucket (and
    pandas sorts NaN last where the JVM sorts NULLS first). The sentinel
    coalesce must keep valid queries' neighbors identical; the kernel's
    integer-dtype guard fails loudly if the coalesce is ever bypassed."""
    from cog3pio_spark.operators.knn import knn_sort_merge

    queries, points = clustered
    clean = knn_sort_merge(queries, points, k=5, scan_width=32, num_buckets=4)
    a = {(r["query_id"], r["rank"], r["point_id"]) for r in clean.collect()}
    noisy_points = points.unionByName(
        spark.createDataFrame(
            [(99999, float("nan"), float("nan"))], ["point_id", "lat", "lng"]
        )
    )
    noisy = knn_sort_merge(
        queries, noisy_points, k=5, scan_width=32, num_buckets=4
    )
    b = {(r["query_id"], r["rank"], r["point_id"]) for r in noisy.collect()}
    assert a == b


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


def test_certificate_completeness_on_clustered(spark):
    """r4 review: ring_exactness_bound located the ring CENTER by array
    position (it sits at k_ring's (0,0) delta index, not index 0), which
    collapsed the bound ~8x and left almost every provably-exact
    ring-served query uncertified. Completeness pin: on a dense cluster
    with small k, a solid majority of ring-served queries must certify;
    soundness stays pinned by test_exactness_certificate_* (no false
    certificates)."""
    from cog3pio_spark.operators.knn import knn_brute, knn_join

    rng = np.random.RandomState(47)
    lat = 40.0 + rng.rand(600) * 0.08
    lng = 7.0 + rng.rand(600) * 0.08
    points = spark.createDataFrame(
        [(i, float(lat[i]), float(lng[i])) for i in range(600)],
        ["point_id", "lat", "lng"],
    )
    queries = points.filter(F.col("point_id") % 40 == 0).withColumnRenamed(
        "point_id", "query_id"
    )
    out = knn_join(queries, points, k=3, res=7, ring=2, with_certificate=True)
    rows = out.collect()
    certified = {r["query_id"] for r in rows if r["exact"]}
    allq = {r["query_id"] for r in rows}
    assert len(certified) >= len(allq) * 0.6, (len(certified), len(allq))
    # certified results really are exact
    brute = knn_brute(queries, points, k=3)
    exact = {
        (r["query_id"], r["rank"], r["point_id"]) for r in brute.collect()
    }
    got = {
        (r["query_id"], r["rank"], r["point_id"])
        for r in rows
        if r["query_id"] in certified
    }
    assert got <= exact


def test_sort_merge_face_seam_parity(spark):
    """r4 review: ordering by the SIGNED cell carrier put faces 4-5 before
    0-3, inserting an artificial curve seam at the face 3|4 boundary
    (lng ~ -135) where cross-face neighbors fell outside every scan frame.
    With the unsigned curve key, a corpus straddling that boundary matches
    brute force at covering scan_width."""
    from cog3pio_spark.operators.knn import knn_brute, knn_sort_merge

    rng = np.random.RandomState(53)
    lat = -0.04 + rng.rand(400) * 0.08
    lng = -135.06 + rng.rand(400) * 0.12  # straddles lng=-135 (face 3|4)
    points = spark.createDataFrame(
        [(i, float(lat[i]), float(lng[i])) for i in range(400)],
        ["point_id", "lat", "lng"],
    )
    queries = points.filter(F.col("point_id") % 25 == 0).withColumnRenamed(
        "point_id", "query_id"
    )
    sm = knn_sort_merge(queries, points, k=3, scan_width=512)
    bf = knn_brute(queries, points, k=3)
    a = {(r["query_id"], r["rank"], r["point_id"]) for r in sm.collect()}
    b = {(r["query_id"], r["rank"], r["point_id"]) for r in bf.collect()}
    assert a == b
