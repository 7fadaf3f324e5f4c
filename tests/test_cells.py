"""Property tests for the from-scratch cell indexes (SURVEY §7 M2)."""

from __future__ import annotations

import collections

import numpy as np
import pytest

from cog3pio_spark.cells import h3x, s2

RNG = np.random.RandomState(99)
LAT = RNG.uniform(-85, 85, 3000)
LNG = RNG.uniform(-180, 180, 3000)


class TestS2:
    def test_leaf_roundtrip(self):
        leaf = s2.latlng_to_cell(LAT, LNG, 30)
        assert np.all(s2.level_of(leaf) == 30)
        clat, clng = s2.cell_center_latlng(leaf)
        assert np.abs(clat - LAT).max() < 1e-5
        assert (np.abs((clng - LNG + 180) % 360 - 180)).max() < 1e-4

    def test_parent_contains_child(self):
        leaf = s2.latlng_to_cell(LAT, LNG, 30)
        for lvl in (5, 10, 20):
            p = s2.parent(leaf, lvl)
            assert np.all(s2.level_of(p) == lvl)
            assert np.all(s2.range_min(p) <= leaf)
            assert np.all(leaf <= s2.range_max(p))

    def test_parent_transitive(self):
        leaf = s2.latlng_to_cell(LAT, LNG, 30)
        assert np.all(s2.parent(s2.parent(leaf, 12), 6) == s2.parent(leaf, 6))

    def test_face_centers(self):
        cases = [((0, 0), 0), ((0, 90), 1), ((90, 0), 2), ((0, 180), 3), ((0, -90), 4), ((-90, 0), 5)]
        for (lat, lng), face in cases:
            c = s2.latlng_to_cell(np.array([float(lat)]), np.array([float(lng)]), 0)
            assert int(c[0] >> np.uint64(61)) == face

    def test_locality(self):
        a = s2.latlng_to_cell(LAT, LNG, 30)
        b = s2.latlng_to_cell(LAT + 1e-7, LNG, 30)
        assert (s2.parent(a, 20) == s2.parent(b, 20)).mean() > 0.95

    def test_signed_view_roundtrip(self):
        leaf = s2.latlng_to_cell(LAT, LNG, 30)
        assert np.all(s2.from_signed(s2.to_signed(leaf)) == leaf)


class TestHex:
    def test_children_parent_closure(self):
        for res in (3, 7, 11):
            c = np.unique(h3x.latlng_to_cell(LAT, LNG, res))
            ch = h3x.children(c)
            assert np.all(h3x.parent(ch.ravel()).reshape(ch.shape) == c[:, None])
            assert np.unique(ch.ravel()).size == ch.size

    def test_exact_partition_into_7(self):
        patch = h3x.k_ring(h3x.latlng_to_cell(np.array([47.0]), np.array([8.0]), 9), 20).ravel()
        counts = collections.Counter(h3x.parent(patch).tolist())
        assert max(counts.values()) == 7
        assert sum(1 for v in counts.values() if v == 7) > 100

    def test_multi_level_parent_consistency(self):
        c = h3x.latlng_to_cell(LAT, LNG, 12)
        assert np.all(h3x.parent(h3x.parent(c, 9), 5) == h3x.parent(c, 5))

    def test_kring_size_and_distance(self):
        c = np.unique(h3x.latlng_to_cell(LAT[:200], LNG[:200], 8))
        for k in (1, 2, 3):
            ring = h3x.k_ring(c, k)
            assert ring.shape[1] == 3 * k * (k + 1) + 1
            a = np.repeat(c, ring.shape[1])
            assert np.all(h3x.hex_distance(a, ring.ravel()) <= k)

    def test_geo_locality(self):
        a = h3x.latlng_to_cell(LAT, LNG, 5)
        b = h3x.latlng_to_cell(LAT + 1e-6, LNG, 5)
        assert (a == b).mean() > 0.99

    def test_resolution_extraction(self):
        for res in (0, 5, 15):
            c = h3x.latlng_to_cell(LAT[:50], LNG[:50], res)
            assert np.all(h3x.resolution(c) == res)


class TestS2Compaction:
    def test_full_sibling_sets_promote(self):
        p10 = np.unique(s2.parent(s2.latlng_to_cell(LAT[:30], LNG[:30], 30), 10))
        lsb = p10 & (~p10 + np.uint64(1))
        q = lsb >> np.uint64(2)
        base = p10 - lsb + q
        kids = np.stack([base + np.uint64(2 * i) * q for i in range(4)], 1).ravel()
        assert np.all(s2.level_of(kids) == 11)
        comp = s2.compact_np(kids)
        assert set(comp.tolist()) == set(p10.tolist())  # fully promoted

    def test_partial_sets_kept(self):
        c = s2.latlng_to_cell(LAT[:50], LNG[:50], 12)  # scattered: no full sets
        comp = s2.compact_np(c)
        assert set(comp.tolist()) == set(np.unique(c).tolist())


class TestCompactionNumpy:
    """compact/uncompact round-trip at the numpy level (DataFrame op in
    tests/test_operators.py)."""

    def test_full_children_compact_roundtrip(self):
        base = np.unique(h3x.latlng_to_cell(LAT[:100], LNG[:100], 6))
        kids = h3x.children(base).ravel()  # complete sets by construction
        parents = np.unique(h3x.parent(kids))
        assert np.array_equal(np.sort(parents), np.sort(base))


def test_cover_bbox_face_straddling_clips_to_center_face():
    """r4 review: a bbox straddling an S2 face edge used to produce a
    garbage axial extent (corners projected onto their OWN faces but read
    in corner 0's frame) and, through cover_bbox_compact's fallback, a
    silent single-cell covering. Now every corner projects onto the
    CENTER's face and clamps to the face rim: the straddling covering is
    comparable to the same-size in-face covering (the documented clip can
    only trim the out-of-face sliver)."""
    import numpy as np

    from cog3pio_spark.cells import h3x

    straddle = h3x.cover_bbox_compact(10.0, -45.4, 10.6, -44.6)
    in_face = h3x.cover_bbox_compact(10.0, -40.4, 10.6, -39.6)
    assert len(straddle) >= len(in_face) * 0.5, (len(straddle), len(in_face))
    assert len(straddle) > 10  # never the 1-cell fallback
    # all covering cells live on the center's face
    faces = set(h3x.cell_center_uv(np.asarray(straddle))[0].tolist())
    assert len(faces) == 1


def test_null_coords_yield_null_cells(spark):
    """r4 review: NaN lat/lng used to cast to a VALID-LOOKING cell id
    (platform-dependent face-corner cell), silently joining null-coordinate
    rows into real spatial cells. Null coords now produce null cells across
    all three assignment UDFs."""
    from pyspark.sql import functions as F

    from cog3pio_spark.functions import cells as C

    df = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, None, 20.0), (3, 10.0, None), (4, None, None)],
        "id long, lat double, lng double",
    )
    out = df.select(
        "id",
        C.s2_cell(F.col("lat"), F.col("lng"), 12).alias("s2"),
        C.h3x_cell(F.col("lat"), F.col("lng"), 8).alias("hx"),
        C.h3x_multi_res(F.col("lat"), F.col("lng"), 5, 7).alias("multi"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["s2"] is not None and by_id[1]["hx"] is not None
    assert len(by_id[1]["multi"]) == 3
    for i in (2, 3, 4):
        assert by_id[i]["s2"] is None, i
        assert by_id[i]["hx"] is None, i
        assert by_id[i]["multi"] is None, i


def test_uncompact_rejects_finer_than_target(spark):
    """r4 review: cells finer than target_res used to pass through
    unchanged, silently mixing resolutions in the uniform-res contract."""
    import numpy as np
    import pytest as _pytest

    from cog3pio_spark.cells import h3x
    from cog3pio_spark.operators.assign import uncompact_cells

    fine = h3x.latlng_to_cell(np.array([10.0]), np.array([20.0]), 9)
    df = spark.createDataFrame([(int(fine[0]),)], ["cell"])
    with _pytest.raises(Exception, match="finer"):
        uncompact_cells(df, target_res=8).collect()


def test_tile_covering_null_affine_rows(spark):
    """r4 review: Arrow delivers null doubles as NaN, so the old `is None`
    guard never fired and null-affine rows got garbage single-cell
    coverings; they now produce null coverings."""
    from cog3pio_spark.operators.assign import tile_covering

    df = spark.createDataFrame(
        [
            ("ok", 100.0, 60.0, 0.5, -0.5, 16, 16),
            ("no_geo", None, None, None, None, 16, 16),
        ],
        "media_ref string, c double, f double, a double, e double, "
        "width int, height int",
    )
    rows = {r["media_ref"]: r["covering_cells"] for r in tile_covering(df).collect()}
    assert rows["ok"] is not None and len(rows["ok"]) > 0
    assert rows["no_geo"] is None


def test_x_coords_zero_width(spark):
    """r4 review: sequence(0, -1) inferred step -1 and emitted [0, -1] —
    two bogus coordinates for width=0 instead of the documented empty axis."""
    from pyspark.sql import functions as F

    from cog3pio_spark.functions import geo as G

    df = spark.createDataFrame([(0,), (3,)], ["w"])
    out = {
        r["w"]: r["xs"]
        for r in df.select(
            "w",
            G.x_coords_expr(F.lit(2.0), F.lit(10.0), F.col("w")).alias("xs"),
        ).collect()
    }
    assert out[0] == []
    assert out[3] == [11.0, 13.0, 15.0]


def test_coords_null_dims_yield_null(spark):
    """r6 review: NULL width/height fell into the otherwise(empty) branch,
    turning a missing dimension into a valid-looking empty axis (zero rows
    downstream instead of a NULL to surface). NULL in → NULL out."""
    from pyspark.sql import functions as F

    from cog3pio_spark.functions import geo as G

    df = spark.createDataFrame([(None,), (2,)], "w int")
    out = {
        i: (r["xs"], r["ys"])
        for i, r in enumerate(
            df.select(
                G.x_coords_expr(F.lit(2.0), F.lit(10.0), F.col("w")).alias("xs"),
                G.y_coords_expr(F.lit(-2.0), F.lit(10.0), F.col("w")).alias("ys"),
            ).collect()
        )
    }
    assert out[0] == (None, None)
    assert out[1] == ([11.0, 13.0], [9.0, 7.0])


def test_cover_bbox_is_true_covering():
    """r5 fix: cover_bbox used to keep only cells whose CENTERS fall in the
    bbox, dropping boundary-overlapping cells — interior points near the
    edge were uncovered (silent tile-edge loss for covering-based joins).
    Now a superset: every interior sample's cell (or ancestor, for the
    compacted variant) must be in the covering."""
    rng = np.random.RandomState(19)
    boxes = []
    for _ in range(12):
        boxes.append(
            (
                float(rng.uniform(-55, 50)), float(rng.uniform(-160, 150)),
                float(rng.uniform(0.01, 0.6)), float(rng.uniform(0.01, 0.6)),
            )
        )
    # high-latitude cases (r5 review: a scalar single-neighbor pad under-
    # covered the lng axis past ~60° where a hexagon's lng-degree extent
    # grows by 1/cos(lat); the pad is per-axis from both basis vectors now)
    for lat0 in (60.0, 66.5, 71.2, -68.0):
        boxes.append((lat0, float(rng.uniform(-150, 150)), 0.2, 0.5))
    for lat0, lng0, dlat, dlng in boxes:
        lat1, lng1 = lat0 + dlat, lng0 + dlng
        cells, base_res = h3x.cover_bbox_compact(
            lat0, lng0, lat1, lng1, 64, return_res=True
        )
        arr = np.asarray(cells, np.int64)
        assert arr.size > 0
        res = h3x.resolution(arr)
        lo = int(res.min())
        assert int(res.max()) <= base_res
        # corner/edge-INCLUSIVE grid; coverage contract = direct assignment
        # at the BASE res, then ancestor-walk membership (a compacted set
        # covers hierarchically — aperture-7 parents are not geometric
        # unions of children, so coarser direct assignment is not sound)
        gl, gn = np.meshgrid(
            np.linspace(lat0, lat1, 9), np.linspace(lng0, lng1, 9)
        )
        cur = h3x.latlng_to_cell(gl.ravel(), gn.ravel(), base_res)
        covered = np.zeros(cur.shape, dtype=bool)
        for r in range(base_res, lo - 1, -1):
            sel = arr[res == r]
            if sel.size:
                covered |= np.isin(cur, sel)
            if r > lo:
                cur = h3x.parent(cur, r - 1)
        assert covered.all(), (lat0, lng0, lat1, lng1, int((~covered).sum()))


def test_null_bearing_cell_batch_keeps_ids_bit_exact(spark):
    """ADVICE r5 (high): one NULL cell in an Arrow batch used to flip the
    whole LongType batch to float64, silently rounding EVERY non-null hex id
    (low bits carry q/r — a res-8 id came back ~230 lattice steps away).
    The null-masked wrappers must return bit-exact ids alongside NULLs."""
    import numpy as np
    from pyspark.sql import functions as F

    from cog3pio_spark.cells import h3x
    from cog3pio_spark.functions import cells as C

    lat = np.linspace(-60, 60, 64)
    lng = np.linspace(-170, 170, 64)
    ids = h3x.latlng_to_cell(lat, lng, 8).astype(np.int64)
    rows = [(int(c),) for c in ids] + [(None,)]
    df = spark.createDataFrame(rows, ["cell"]).coalesce(1)  # ONE batch

    got = df.select(
        "cell",
        C.h3x_parent(F.col("cell"), 5).alias("p5"),
        C.h3x_resolution(F.col("cell")).alias("res"),
        C.h3x_kring(F.col("cell"), 1).alias("ring"),
    ).collect()
    by_cell = {r["cell"]: r for r in got}
    assert by_cell[None]["p5"] is None
    assert by_cell[None]["res"] is None
    assert by_cell[None]["ring"] is None
    exp_p5 = h3x.parent(ids, 5)
    exp_ring = h3x.k_ring(ids, 1)
    for i, c in enumerate(ids):
        r = by_cell[int(c)]
        assert r["p5"] == int(exp_p5[i]), f"parent id rounded for {c}"
        assert r["res"] == 8
        assert sorted(r["ring"]) == sorted(int(x) for x in exp_ring[i])

    # s2 wrappers: same contract on the signed carrier
    from cog3pio_spark.cells import s2

    s2ids = s2.to_signed(s2.latlng_to_cell(lat, lng, 12)).astype(np.int64)
    rows = [(int(c),) for c in s2ids] + [(None,)]
    df2 = spark.createDataFrame(rows, ["cell"]).coalesce(1)
    got2 = {r["cell"]: r for r in df2.select(
        "cell",
        C.s2_parent(F.col("cell"), 8).alias("p8"),
        C.s2_range_min(F.col("cell")).alias("lo"),
        C.s2_range_max(F.col("cell")).alias("hi"),
    ).collect()}
    assert got2[None]["p8"] is None and got2[None]["lo"] is None
    exp_p8 = s2.to_signed(s2.parent(s2.from_signed(s2ids), 8))
    exp_lo = s2.to_signed(s2.range_min(s2.from_signed(s2ids)))
    for i, c in enumerate(s2ids):
        assert got2[int(c)]["p8"] == int(exp_p8[i])
        assert got2[int(c)]["lo"] == int(exp_lo[i])
