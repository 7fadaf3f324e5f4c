"""H3-style aperture-7 hexagonal hierarchy, from scratch in numpy.

Design (documented divergence): the sandbox has no ``h3`` package, and the
reference (cog3pio) contains no hex indexing at all — the hierarchy below is
the engine's own spec-faithful aperture-7 system, built so that every property
the pipeline relies on is *exact by construction* and property-tested:

* aperture-7 subdivision with alternating rotation classes (axial matrices
  A7 = [[3, 1], [-1, 2]] and A7R = [[2, -1], [1, 3]], |det| = 7, chosen so the
  7-cell flower cluster is an exact fundamental domain — see below);
* parent/children closure: ``parent(child(c)) == c`` for all 7 children;
* k_ring via exact axial-coordinate ring arithmetic;
* compact/uncompact: 7 present children ⇒ parent, lossless round-trip.

Cells are anchored to the 6 S2 cube faces via gnomonic (u,v) projection
(cells/s2.py) rather than the 20-face icosahedron; ids are NOT numerically
h3-compatible (no h3 library exists in-sandbox to compare against — SURVEY
§7 hard-part 1). Cross-face rings are truncated at face edges; the kNN
operator compensates with its sort-merge fallback and caps its exactness
certificate at face edges (operators/knn.py).

Round-2 decision on libh3 bit-compatibility (VERDICT r1 "Next" #6): NOT
attempted. True bit-compat requires libh3's canonical data tables — the
122-base-cell table (home face/IJK/pentagon flags) and the per-face
[face][i][j][k] → (base cell, ccw rotations) lookup — which are arbitrary
implementation constants, not derivable from the spec's geometry. Without
network access to the canonical tables, a from-memory reconstruction would
emit silently-wrong ids on external joins — strictly worse than this
documented own-system, which fails loudly (disjoint id spaces, empty
joins). Interop path for a real deployment: ship the cell assignment as a
pluggable indexer and register libh3 (or the published tables) where
available; every operator above this module keys on opaque int64 cells and
is indexer-agnostic.

id layout (int64, zero sign bit):
    [1 zero][4 bits res][3 bits face][28 bits i+OFF][28 bits j+OFF]
with OFF = 2^27 so axial coords may be negative. Res 0..15.
"""

from __future__ import annotations

import numpy as np

from cog3pio_spark.cells import s2

MAX_RES = 15
_OFF = 1 << 27
_MASK28 = (1 << 28) - 1

# Axial aperture-7 matrices. Chosen so the 7-cell "flower" cluster
# {(0,0), ±(1,0), ±(0,1), ±(1,-1)} is an exact fundamental domain of
# Z²/A·Z² (order 7): the residues of the cluster deltas under the linear
# functional φ are all distinct, making parent assignment exact integer
# arithmetic (no float rounding in the hierarchy).
#   A7  = [[3,1],[-1,2]], φ7(q,r)  = (q + 3r) mod 7 → residues {0,1,3,6,4,5,2}
#   A7R = [[2,-1],[1,3]], φ7r(q,r) = (q + 5r) mod 7 → residues {0,1,5,6,2,3,4}
_A7 = np.array([[3, 1], [-1, 2]], dtype=np.int64)
_A7R = np.array([[2, -1], [1, 3]], dtype=np.int64)

# cluster deltas indexed 0..6 (digit order: center, then 6 neighbors CCW)
_DELTAS = np.array(
    [(0, 0), (1, 0), (0, 1), (-1, 0), (0, -1), (1, -1), (-1, 1)], dtype=np.int64
)
# residue → delta-index lookup for each matrix class
_RES2DELTA_A7 = np.zeros(7, dtype=np.int64)
_RES2DELTA_A7R = np.zeros(7, dtype=np.int64)
for _idx, (_dq, _dr) in enumerate(_DELTAS):
    _RES2DELTA_A7[(_dq + 3 * _dr) % 7] = _idx
    _RES2DELTA_A7R[(_dq + 5 * _dr) % 7] = _idx

# res-0 lattice scale: axial unit length in face (u,v) coordinates.
# Face spans u,v ∈ [-1,1]; res-0 hexes of size ~0.4 cover it with |coords|≤4.
_RES0_SIZE = 0.4

# Precompute res-r lattice transforms L(r): world(u,v) → fractional axial
# at res r:  ax_r = M(r) · (u,v)/_RES0_SIZE, where M(0)=I, M(r+1)=A·M(r).
_M: list[np.ndarray] = [np.eye(2, dtype=np.float64)]
for _r in range(MAX_RES):
    _A = _A7 if _r % 2 == 0 else _A7R  # alternate Class II/III
    _M.append(_A.astype(np.float64) @ _M[-1])

# hex basis on the face plane: axial (q, r) → cartesian
_BASIS = np.array([[1.0, 0.5], [0.0, np.sqrt(3.0) / 2.0]])
_BASIS_INV = np.linalg.inv(_BASIS)


def _cube_round(qf: np.ndarray, rf: np.ndarray):
    """Standard cube-coordinate rounding to the nearest hex center."""
    sf = -qf - rf
    q = np.rint(qf)
    r = np.rint(rf)
    s = np.rint(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def _pack(res: np.ndarray, face: np.ndarray, q: np.ndarray, r: np.ndarray):
    return (
        (np.asarray(res, np.int64) << np.int64(59))
        | (np.asarray(face, np.int64) << np.int64(56))
        | ((q + _OFF) << np.int64(28))
        | (r + _OFF)
    )


def _unpack(cell: np.ndarray):
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> np.int64(59)) & np.int64(0xF)
    face = (cell >> np.int64(56)) & np.int64(0x7)
    q = ((cell >> np.int64(28)) & np.int64(_MASK28)) - _OFF
    r = (cell & np.int64(_MASK28)) - _OFF
    return res, face, q, r


# ---------------------------------------------------------------------------
# geo → cell
# ---------------------------------------------------------------------------
def latlng_to_cell(lat_deg, lng_deg, res: int) -> np.ndarray:
    """Vectorized lat/lng (deg) → hex cell id at resolution ``res``."""
    return latlng_to_cells_multi(lat_deg, lng_deg, [res])[:, 0]


def latlng_to_cells_multi(lat_deg, lng_deg, res_list: list[int]) -> np.ndarray:
    """(n, len(res_list)) hex ids — ONE lat→xyz→face/(u,v) projection shared
    across resolutions (face/u/v are resolution-invariant; only the 2×2
    lattice transform differs per res). r4: the multi-res assignment UDF
    used to redo the projection trig per resolution."""
    x, y, z = s2.latlng_to_xyz(lat_deg, lng_deg)
    face, u, v = s2.xyz_to_face_uv(x, y, z)
    base = np.stack([u, v]) / _RES0_SIZE        # (2, n) world in res-0 units
    base = _BASIS_INV @ base                    # res-invariant lattice frame
    cols = []
    for res in res_list:
        ax = _M[res] @ base                     # fractional axial at res
        q, r = _cube_round(ax[0], ax[1])
        cols.append(_pack(np.full(q.shape, res, np.int64), face, q, r))
    return np.stack(cols, axis=1)


def cell_center_uv(cell: np.ndarray):
    """Cell center in face (u,v) coordinates (+ face array)."""
    res, face, q, r = _unpack(cell)
    out_u = np.empty(q.shape, np.float64)
    out_v = np.empty(q.shape, np.float64)
    for rr in np.unique(res):
        m = res == rr
        minv = np.linalg.inv(_M[int(rr)])
        pt = _BASIS @ (minv @ np.stack([q[m].astype(np.float64), r[m].astype(np.float64)]))
        out_u[m] = pt[0] * _RES0_SIZE
        out_v[m] = pt[1] * _RES0_SIZE
    return face, out_u, out_v


def resolution(cell: np.ndarray) -> np.ndarray:
    return _unpack(cell)[0]


# ---------------------------------------------------------------------------
# hierarchy
# ---------------------------------------------------------------------------
def parent(cell: np.ndarray, parent_res: int | None = None) -> np.ndarray:
    """Containing cell one (or more) resolution(s) up — exact integer math.

    Each step subtracts the cell's cluster delta (found by its φ-residue mod
    7) and divides by the aperture matrix; division is exact by construction.
    """
    res, face, q, r = _unpack(cell)
    cur = int(res[0]) if res.size else 0
    assert np.all(res == cur), "parent() expects uniform resolution input"
    target = cur - 1 if parent_res is None else parent_res
    assert 0 <= target <= cur
    for step in range(cur, target, -1):
        class_a = (step - 1) % 2 == 0  # the matrix used going down from step-1
        if class_a:
            didx = _RES2DELTA_A7[np.mod(q + 3 * r, 7)]
        else:
            didx = _RES2DELTA_A7R[np.mod(q + 5 * r, 7)]
        q = q - _DELTAS[didx, 0]
        r = r - _DELTAS[didx, 1]
        if class_a:  # inv(A7) = (1/7)[[2,-1],[1,3]]
            q, r = (2 * q - r) // 7, (q + 3 * r) // 7
        else:  # inv(A7R) = (1/7)[[3,1],[-1,2]]
            q, r = (3 * q + r) // 7, (-q + 2 * r) // 7
    return _pack(np.full(q.shape, target, np.int64), face, q, r)


def center_child(cell: np.ndarray, child_res: int) -> np.ndarray:
    res, face, q, r = _unpack(cell)
    cur = int(res[0]) if res.size else 0
    assert np.all(res == cur) and child_res >= cur
    for step in range(cur, child_res):
        a = _A7 if step % 2 == 0 else _A7R
        q, r = a[0, 0] * q + a[0, 1] * r, a[1, 0] * q + a[1, 1] * r
    return _pack(np.full(q.shape, child_res, np.int64), face, q, r)


def children(cell: np.ndarray) -> np.ndarray:
    """The 7 res+1 children of each cell → shape (n, 7)."""
    cc = center_child(cell, int(_unpack(cell)[0][0]) + 1)
    res, face, q, r = _unpack(cc)
    dq = np.array([0, 1, 0, -1, 0, 1, -1], dtype=np.int64)
    dr = np.array([0, 0, 1, 0, -1, -1, 1], dtype=np.int64)
    qs = q[:, None] + dq[None, :]
    rs = r[:, None] + dr[None, :]
    return _pack(
        np.broadcast_to(res[:, None], qs.shape),
        np.broadcast_to(face[:, None], qs.shape),
        qs,
        rs,
    )


def k_ring(cell: np.ndarray, k: int) -> np.ndarray:
    """All cells within hex distance ≤ k (same face) → shape (n, 3k(k+1)+1)."""
    res, face, q, r = _unpack(cell)
    deltas = [(dq, dr) for dq in range(-k, k + 1)
              for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1)]
    dq = np.array([d[0] for d in deltas], dtype=np.int64)
    dr = np.array([d[1] for d in deltas], dtype=np.int64)
    qs = q[:, None] + dq[None, :]
    rs = r[:, None] + dr[None, :]
    return _pack(
        np.broadcast_to(res[:, None], qs.shape),
        np.broadcast_to(face[:, None], qs.shape),
        qs,
        rs,
    )


def cover_bbox(
    lat0: float, lng0: float, lat1: float, lng1: float, res: int, max_cells: int = 4096
) -> np.ndarray:
    """Hex cells COVERING the lat/lng bbox (single-face): every cell whose
    hexagon can intersect the bbox, i.e. centers inside the bbox expanded
    by one lattice spacing (≥ the hex circumradius — conservative
    superset). r5 fix: the old center-inside-bbox test DROPPED
    boundary-overlapping cells whose centers sit just outside, leaving
    bbox-interior points near the edge uncovered — measured 5/931
    uncovered interior samples on the fixture tiles, i.e. silent tile-edge
    data loss for any covering-based join.

    Enumeration: project the 4 bbox corners to fractional axial coords at
    ``res``, enumerate the integer axial bounding box (lattice points of the
    corner hull), then keep cells whose centers land inside the original
    bbox. Exact for face-local bboxes (tiles are tiny vs a cube face); a
    bbox spanning faces is clipped to the face of its CENTER (documented
    engine limitation, same family as ring truncation). r4 fix: every
    corner is gnomonically projected onto the center's face frame and
    clamped to the face extent — the old code projected each corner onto
    its OWN face but read the (u,v) in the first corner's frame, so a
    face-straddling bbox produced a garbage axial extent (and, through
    cover_bbox_compact's fallback, a silent single-cell 'covering').
    """
    from cog3pio_spark.cells import s2 as _s2

    clat_c = np.array([(lat0 + lat1) / 2.0])
    clng_c = np.array([(lng0 + lng1) / 2.0])
    xc, yc, zc = _s2.latlng_to_xyz(clat_c, clng_c)
    cface = int(_s2.xyz_to_face_uv(xc, yc, zc)[0][0])

    corners_lat = np.array([lat0, lat0, lat1, lat1])
    corners_lng = np.array([lng0, lng1, lng0, lng1])
    x, y, z = _s2.latlng_to_xyz(corners_lat, corners_lng)
    # gnomonic (u,v) of each corner IN cface's frame (inverse of the
    # face→xyz mapping below), clamped to the face extent [-1, 1]
    _INV = [  # face → (s, uu, vv): u = uu/s, v = vv/s
        lambda x, y, z: (x, y, z),
        lambda x, y, z: (y, -x, z),
        lambda x, y, z: (z, -x, -y),
        lambda x, y, z: (-x, -z, -y),
        lambda x, y, z: (-y, -z, x),
        lambda x, y, z: (-z, y, x),
    ]
    s, uu, vv = _INV[cface](x, y, z)
    s = np.maximum(s, 1e-12)  # corners past the hemisphere clip to the rim
    u = np.clip(uu / s, -1.0, 1.0)
    v = np.clip(vv / s, -1.0, 1.0)
    pt = np.stack([u, v]) / _RES0_SIZE
    ax = _M[res] @ (_BASIS_INV @ pt)  # fractional axial of corners
    q_lo, q_hi = int(np.floor(ax[0].min())) - 1, int(np.ceil(ax[0].max())) + 1
    r_lo, r_hi = int(np.floor(ax[1].min())) - 1, int(np.ceil(ax[1].max())) + 1
    if (q_hi - q_lo + 1) * (r_hi - r_lo + 1) > max_cells * 4:
        raise ValueError(
            f"bbox covering at res {res} exceeds {max_cells} cells; lower res"
        )
    qs, rs = np.meshgrid(np.arange(q_lo, q_hi + 1), np.arange(r_lo, r_hi + 1))
    qs, rs = qs.ravel(), rs.ravel()
    cells = _pack(
        np.full(qs.shape, res, np.int64),
        np.full(qs.shape, cface, np.int64),
        qs.astype(np.int64),
        rs.astype(np.int64),
    )
    # keep centers inside the bbox EXPANDED by one neighbor spacing in
    # degrees (≥ circumradius ⇒ every hexagon intersecting the bbox keeps
    # its cell; r5 coverage fix — see docstring)
    f, cu, cv = cell_center_uv(cells)
    # face uv → xyz → latlng through the SHARED forward mapping (r4: the
    # 6-lambda table was duplicated here verbatim)
    xs, ys, zs = _s2.face_uv_to_xyz(np.full(cu.shape, cface, np.int64), cu, cv)
    norm = np.sqrt(xs * xs + ys * ys + zs * zs)
    clat = np.degrees(np.arcsin(zs / norm))
    clng = np.degrees(np.arctan2(ys, xs))
    # per-axis pad from BOTH lattice basis vectors measured in the actual
    # local geometry (r5 review: a single-neighbor scalar hypot under-
    # covered the longitude axis at high latitude, where a hexagon's
    # lng-degree extent grows by 1/cos(lat) — pad_lat/pad_lng are each the
    # SUM of the two basis displacements' |Δaxis|, which bounds any vector
    # inside the fundamental cell, hence any center-to-hexagon-edge offset)
    res_a, face_a, q_a, r_a = _unpack(cells[:1])
    pads_lat, pads_lng = [], []
    for dq, dr in ((1, 0), (0, 1)):
        nb = _pack(res_a, face_a, q_a + dq, r_a + dr)
        fn, nu, nv = cell_center_uv(nb)
        xn, yn, zn = _s2.face_uv_to_xyz(np.full(nu.shape, cface, np.int64), nu, nv)
        nrm = np.sqrt(xn * xn + yn * yn + zn * zn)
        nlat = np.degrees(np.arcsin(zn / nrm))
        nlng = np.degrees(np.arctan2(yn, xn))
        pads_lat.append(abs(float(nlat[0] - clat[0])))
        pads_lng.append(abs(float(nlng[0] - clng[0])))
    pad_lat = pads_lat[0] + pads_lat[1]
    pad_lng = pads_lng[0] + pads_lng[1]
    keep = (
        (clat >= min(lat0, lat1) - pad_lat) & (clat <= max(lat0, lat1) + pad_lat)
        & (clng >= min(lng0, lng1) - pad_lng) & (clng <= max(lng0, lng1) + pad_lng)
    )
    return cells[keep]


def compact_np(cells: np.ndarray, res_lo: int = 0) -> np.ndarray:
    """Numpy compaction: 7 present siblings ⇒ parent, iterated to res_lo.

    Exact (integer parent math); input must be a distinct single-res set.
    DataFrame-scale compaction lives in operators/assign.py; this kernel is
    for per-tile covering sets inside Arrow batches.
    """
    cells = np.unique(cells)
    if cells.size == 0:
        return cells
    out: list[np.ndarray] = []
    cur = cells
    res = int(resolution(cur[:1])[0])
    while res > res_lo and cur.size:
        par = parent(cur)
        uniq, counts = np.unique(par, return_counts=True)
        full = uniq[counts == 7]
        keep_mask = ~np.isin(par, full)
        out.append(cur[keep_mask])
        cur = full
        res -= 1
    out.append(cur)
    return np.concatenate(out)


def cover_bbox_compact(
    lat0: float, lng0: float, lat1: float, lng1: float,
    target_cells: int = 64, res_max: int = 12, return_res: bool = False,
):
    """Adaptive-resolution compacted covering of a bbox: pick the finest res
    whose covering stays under ~2×target, then compact.

    ``return_res=True`` additionally returns the BASE resolution the
    covering was enumerated at before compaction (r5): the compacted set's
    coverage contract is hierarchical — a point is covered iff its direct
    base-res cell has an ancestor in the set. Direct assignment at a
    COARSER present res is NOT equivalent (aperture-7 parents are not the
    geometric union of their children), so checkers need the base res.
    """
    chosen = None
    chosen_res = res_max
    for res in range(2, res_max + 1):
        try:
            cells = cover_bbox(lat0, lng0, lat1, lng1, res,
                               max_cells=max(256, target_cells * 4))
        except ValueError:
            break
        chosen = cells
        chosen_res = res
        if len(cells) >= target_cells:
            break
    if chosen is None or len(chosen) == 0:
        # degenerate bbox: single cell at res_max of the center
        out = latlng_to_cell(
            np.array([(lat0 + lat1) / 2]), np.array([(lng0 + lng1) / 2]), res_max
        )
        return (out, res_max) if return_res else out
    out = compact_np(chosen)
    return (out, chosen_res) if return_res else out


def hex_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hex grid distance between same-face, same-res cells."""
    ra, fa, qa, rra = _unpack(a)
    rb, fb, qb, rrb = _unpack(b)
    dq, dr = qa - qb, rra - rrb
    return np.where(
        fa == fb,
        (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2,
        np.int64(1 << 30),
    )
