"""kNN via hex k-ring expansion join + brute-force fallback (SURVEY §2.B).

Phase 1 (scale path): each query expands its hex cell to a k-ring
(ARRAY explode → equi-join on cell). The join is a plain shuffled equi-join
on cell id — broadcastable when the query side is small (we hint it).
True distance is then exact haversine (column math) and a row_number()
window keeps the k nearest.

Phase 2 (completeness): queries with < k matches after phase 1 (sparse
regions, face-boundary ring truncation — cells/h3x.py docstring) fall back
to a broadcast brute-force pass over the points. At 100 TB the fallback set
is the rare tail: ring misses are O(queries), never O(points); the fallback
cost is |missed queries| × |points in coarse cells|, bounded by escalating
ring radius before brute force.

Used with points = tile centroids and queries = arbitrary lat/lng rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cog3pio_spark.functions import cells as C

EARTH_RADIUS_M = 6378137.0

# target rows per sort-merge bucket once the corpus outgrows the shuffle
# partition count — bounds the pandas frame one kernel task materializes
_BUCKET_ROWS_TARGET = 2_000_000


def haversine_m(lat1, lng1, lat2, lng2):
    """Great-circle distance in meters — pure column math (codegen)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlng = F.radians(lng2 - lng1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlng / 2) ** 2
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def knn_brute(
    queries: DataFrame,
    points: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    point_id: str = "point_id",
) -> DataFrame:
    """Exact kNN by broadcast cross product — the small-query-set path and
    the correctness oracle for the ring join (oracle-checked by the driver).
    Returns (query_id, rank, point_id, dist_m)."""
    q = queries.select(query_id, F.col("lat").alias("q_lat"), F.col("lng").alias("q_lng"))
    p = points.select(point_id, F.col("lat").alias("p_lat"), F.col("lng").alias("p_lng"))
    w = Window.partitionBy(query_id).orderBy(F.col("dist_m").asc(), F.col(point_id).asc())
    return (
        F.broadcast(q)
        .crossJoin(p)
        .withColumn(
            "dist_m", haversine_m(F.col("q_lat"), F.col("q_lng"), F.col("p_lat"), F.col("p_lng"))
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", point_id, "dist_m")
    )


def knn_sort_merge(
    queries: DataFrame,
    points: DataFrame,
    k: int = 5,
    scan_width: int = 64,
    query_id: str = "query_id",
    point_id: str = "point_id",
    num_buckets: int | None = None,
    total_rows: int | None = None,
    cuts: list[int] | None = None,
) -> DataFrame:
    """Sort-merge kNN on the S2 Hilbert curve (SURVEY §2.B kNN fallback).

    Queries and points are unioned and bucketed into contiguous S2-leaf
    curve ranges (cut points from approxQuantile — the same sampling idea as
    Spark's RangePartitioner). Within each bucket, rows sort by
    (_cell, _is_q, _id) — a total order — and each query examines the
    ±``scan_width`` rows around it, re-ranking candidates by exact
    haversine. Boundary correctness: the last/first ``scan_width`` rows of
    every bucket are duplicated as "ghost" rows into the adjacent bucket, so
    each in-bucket frame is EXACTLY the global curve-order frame (a frame
    overhangs a bucket edge by at most scan_width rows, which is precisely
    what the ghosts supply). Precondition: every bucket holds ≥ scan_width
    rows — the bucket count is capped at total/(4·scan_width) so AVERAGE
    buckets are 4× over the minimum; a duplicate-heavy cell distribution
    (one cell value holding a large fraction of rows) can still pinch an
    individual bucket below scan_width, in which case frames near that
    bucket see slightly fewer than ±scan_width global-order rows (the
    operator is approximate anyway; the equality test pins parity on
    realistic data).

    This replaces the round-1 global un-partitioned ``Window.orderBy``
    (single task over the whole union — VERDICT r1 "What's wrong" #5): the
    window stage now runs one task per bucket with no SinglePartition
    exchange. Approximate: curve locality misses some true neighbors at
    curve discontinuities; recall is tuned by scan_width. Use when the query
    set is too large to broadcast and rings miss (sparse regions).
    """
    from functools import reduce

    # _cell is the UNSIGNED curve key: s2_cell's int64 carrier stores uint64
    # ids two's-complement, so sorting the signed value directly would place
    # faces 4-5 before 0-3 — an artificial seam at the face 3|4 boundary
    # where true neighbors land outside every ±scan_width frame (r4 review;
    # functions/cells.py calls the signed order cosmetic, but THIS operator
    # relies on curve adjacency). XOR with the sign bit maps signed order to
    # uint order. ``cuts=`` hints are in this same flipped keyspace (any
    # monotone cut set is CORRECT regardless — cuts only shape buckets).
    sign_flip = F.lit(-(1 << 63))
    q = queries.select(
        F.col(query_id).alias("_id"),
        F.lit(True).alias("_is_q"),
        "lat",
        "lng",
        C.s2_cell(F.col("lat"), F.col("lng"), 30).bitwiseXOR(sign_flip).alias("_cell"),
    )
    p = points.select(
        F.col(point_id).alias("_id"),
        F.lit(False).alias("_is_q"),
        "lat",
        "lng",
        C.s2_cell(F.col("lat"), F.col("lng"), 30).bitwiseXOR(sign_flip).alias("_cell"),
    )
    # Materialize the (id, is_q, lat, lng, cell) union ONCE: the bucket
    # count, the quantile cuts, the ghost branches and the window otherwise
    # each recompute the s2_cell pandas_udf scan (measured 11.8 s → 4 s at
    # sf0.1). localCheckpoint is per-call (no cross-run plan-cache reuse —
    # the CLAUDE.md persist() honesty concern doesn't apply) and truncates
    # lineage so all consumers read the materialized blocks.
    both = q.unionByName(p).localCheckpoint(eager=True)

    # --- bucket count: honor the >=scan_width-rows-per-bucket precondition.
    # Callers with table stats skip both preparatory jobs (VERDICT r2 #4):
    # ``total_rows=`` skips the count, ``cuts=`` (precomputed curve cut
    # points, e.g. from a previous run or partition metadata) skips count
    # AND approxQuantile. Ghost rows repair ADJACENT-bucket boundaries, so
    # supplied cuts inherit the same precondition as the auto path: every
    # INTERIOR bucket must hold ≥ scan_width rows. A thin middle bucket
    # (fewer rows than scan_width between two cuts) shrinks the frames that
    # overhang it — empty/thin EDGE buckets are harmless. Cut balance beyond
    # that only affects task skew, never correctness.
    spark = both.sparkSession
    if cuts is None:
        total = total_rows if total_rows is not None else both.count()
        default_p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        # scale-adaptive bucket count (guide §2.2): the pandas kernel below
        # materializes one whole bucket per task (the JVM window it replaced
        # spilled), so bucket row count must stay bounded as total grows.
        # The floor total // _BUCKET_ROWS_TARGET is 0 at gate/bench scales
        # (total < target × shuffle partitions ⇒ identical bucketing to the
        # pre-floor code) and only engages where default_p would have put
        # millions of rows into one pandas frame. Any bucket count yields
        # the same result while interior buckets hold ≥ scan_width rows
        # (the ghost contract above); 2M-row buckets satisfy that hugely.
        floor = total // _BUCKET_ROWS_TARGET
        n_buckets = max(
            1, min(num_buckets or max(default_p, floor), total // (4 * scan_width))
        )
        if n_buckets > 1:
            cuts = both.stat.approxQuantile(
                "_cell", [i / n_buckets for i in range(1, n_buckets)], 1.0 / (10 * n_buckets)
            )
    # clamp: approxQuantile returns float64 and float(2^63-1) rounds UP to
    # 2^63, which overflows F.lit's long conversion (r4 review)
    int64_max = (1 << 63) - 1
    cuts = sorted({min(int(c), int64_max) for c in cuts}) if cuts else []
    if cuts:
        bucket_expr = reduce(
            lambda acc, ic: F.when(F.col("_cell") <= F.lit(ic[1]), ic[0]).otherwise(acc),
            reversed(list(enumerate(cuts))),
            F.lit(len(cuts)),
        )
    else:
        bucket_expr = F.lit(0)
    both = both.withColumn("_bucket", bucket_expr)

    order_cols = [F.col("_cell"), F.col("_is_q"), F.col("_id")]
    wb = Window.partitionBy("_bucket").orderBy(*order_cols)
    wcnt = Window.partitionBy("_bucket")
    rows = (
        both.withColumn("_rn", F.row_number().over(wb))
        .withColumn("_n", F.count("*").over(wcnt))
        .withColumn("_ghost", F.lit(False))
    )
    if cuts:
        lo_ghosts = (
            rows.filter((F.col("_rn") <= scan_width) & (F.col("_bucket") > 0))
            .withColumn("_bucket", F.col("_bucket") - 1)
            .withColumn("_ghost", F.lit(True))
        )
        hi_ghosts = (
            rows.filter(
                (F.col("_rn") > F.col("_n") - scan_width)
                & (F.col("_bucket") < len(cuts))
            )
            .withColumn("_bucket", F.col("_bucket") + 1)
            .withColumn("_ghost", F.lit(True))
        )
        rows = rows.unionByName(lo_ghosts).unionByName(hi_ghosts)
    rows = rows.drop("_rn", "_n")
    # NULL _cell rows (NaN coords → s2_cell NULL, the r5 fix) would make
    # Arrow deliver the whole bucket's _cell batch as float64 — silently
    # rounding every level-30 carrier in the bucket (the same corruption
    # class fixed in functions/cells.py) and sorting NaN LAST where the
    # JVM windows above sort NULLS FIRST. Coalesce NULL to int64 min: it
    # sorts first (JVM null-ordering parity), is unreachable as a real
    # carrier (level-30 ids have the trailing bit set, so every unsigned
    # carrier is > int64 min), and _cell never appears in the output, so
    # no restore is needed.
    rows = rows.withColumn("_cell", F.coalesce(F.col("_cell"), F.lit(-(1 << 63))))

    # curve-order neighborhood, one task per bucket (ghosts make each frame
    # identical to global curve order). r6 (guide §4.2): the former
    # Window.rowsBetween(-scan_width, scan_width) + collect_list built a
    # (2·scan_width+1)-struct ARRAY FOR EVERY ROW — queries AND points —
    # then threw away the ~95% of arrays belonging to point rows; at the
    # 10× bench that is ~40M struct materializations to keep ~2M. The
    # per-bucket pandas kernel sorts the bucket once by the SAME
    # (_cell, _is_q, _id) total order (unique keys — pandas/JVM sort parity
    # is exact) and slices the position-based ±scan_width frame for
    # NON-GHOST QUERY rows only, emitting exactly the candidate rows the
    # old explode produced (ghost points still serve as frame members;
    # ghost/other query rows still occupy frame positions; the row itself
    # and other queries are dropped from candidates, matching the
    # collect_list's when(~_is_q) null-skip). Row-identical by construction;
    # pinned by tests/test_knn.py parity tests + the q43 oracle.
    id_type = both.schema["_id"].dataType
    cand_schema = T.StructType(
        [
            T.StructField(query_id, id_type),
            T.StructField("q_lat", T.DoubleType()),
            T.StructField("q_lng", T.DoubleType()),
            T.StructField(point_id, id_type),
            T.StructField("p_lat", T.DoubleType()),
            T.StructField("p_lng", T.DoubleType()),
        ]
    )
    sw = int(scan_width)

    def _frames(pdf: pd.DataFrame) -> pd.DataFrame:
        if not np.issubdtype(pdf["_cell"].to_numpy().dtype, np.integer):
            raise TypeError(
                "sort-merge kNN kernel received a non-integer _cell batch "
                f"({pdf['_cell'].dtype}); a null slipped past the coalesce "
                "and the curve keys would be float64-rounded"
            )
        pdf = pdf.sort_values(["_cell", "_is_q", "_id"])
        isq = pdf["_is_q"].to_numpy()
        ghost = pdf["_ghost"].to_numpy()
        ids = pdf["_id"].to_numpy()
        lat = pdf["lat"].to_numpy()
        lng = pdf["lng"].to_numpy()
        nrows = len(pdf)
        q_idx = np.nonzero(isq & ~ghost)[0]
        qa, qla, qlg, pa, pla, plg = [], [], [], [], [], []
        for i in q_idx:
            lo, hi = max(0, i - sw), min(nrows, i + sw + 1)
            sel = np.nonzero(~isq[lo:hi])[0] + lo
            if sel.size:
                qa.append(np.repeat(ids[i], sel.size))
                qla.append(np.repeat(lat[i], sel.size))
                qlg.append(np.repeat(lng[i], sel.size))
                pa.append(ids[sel])
                pla.append(lat[sel])
                plg.append(lng[sel])
        if not qa:
            return pd.DataFrame(
                {c.name: pd.Series(dtype="float64") for c in cand_schema}
            )
        return pd.DataFrame(
            {
                query_id: np.concatenate(qa),
                "q_lat": np.concatenate(qla),
                "q_lng": np.concatenate(qlg),
                point_id: np.concatenate(pa),
                "p_lat": np.concatenate(pla),
                "p_lng": np.concatenate(plg),
            }
        )

    cand = rows.groupBy("_bucket").applyInPandas(_frames, cand_schema)
    dist = cand.withColumn(
        "dist_m", haversine_m(F.col("q_lat"), F.col("q_lng"), F.col("p_lat"), F.col("p_lng"))
    )
    wr = Window.partitionBy(query_id).orderBy(F.col("dist_m").asc(), F.col(point_id).asc())
    return (
        dist.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", point_id, "dist_m")
    )


def ring_exactness_bound(cell, ring: int):
    """Per-cell lower bound (meters) on the distance from any point in the
    cell to any point OUTSIDE its k-ring coverage.

    Derivation: a point outside the ring lies in a cell at hex distance
    ≥ ring+1; center-to-center distance ≥ (ring+1)·d_min where d_min is the
    min neighbor-center spacing around the cell; subtract both cells'
    circumradii (≤ 0.7·d_max for near-regular hexes). The bound is further
    capped by the distance to the nearest cube-face edge: k-rings truncate
    at face boundaries (cells/h3x.py), so a true neighbor just across the
    edge is outside ring coverage at near-zero distance — without the cap a
    face-edge query could be falsely certified (ADVICE r1, medium).
    Conservative — a certified-exact result is therefore ALWAYS exact
    (tested incl. a face-edge fixture), at the cost of some exact results
    going uncertified near face edges.
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from cog3pio_spark.cells import h3x

    @pandas_udf(T.DoubleType())
    def _bound(cells: pd.Series) -> pd.Series:
        arr = cells.to_numpy(np.int64)
        ring1 = h3x.k_ring(arr, 1)  # (n, 7): self + 6 neighbours
        n = arr.shape[0]
        all_cells = ring1.ravel()
        face, u, v = h3x.cell_center_uv(all_cells)
        # gnomonic (u,v) → unit sphere chord ≈ arc for small cells
        norm = np.sqrt(1.0 + u * u + v * v)
        # face-local 3D coords (face axes differ but within one ring the
        # face is constant, so pairwise angles are valid)
        x, y, z = 1.0 / norm, u / norm, v / norm
        xyz = np.stack([x, y, z], axis=1).reshape(n, 7, 3)
        # the SELF cell sits wherever k_ring's lexicographic delta
        # enumeration puts (0,0) — locate it by id, never by position (r4
        # review: assuming index 0 measured 'neighbour' spacing from a ring
        # cell, halving d_min and collapsing the bound ~8x — still sound,
        # but almost nothing could be certified)
        self_mask = ring1 == arr[:, None]  # (n, 7)
        center = xyz[
            np.arange(n), self_mask.argmax(axis=1)
        ][:, None, :]
        cosang = np.clip((xyz * center).sum(axis=2), -1, 1)
        d = np.arccos(cosang) * EARTH_RADIUS_M  # (n, 7) incl. self
        d = np.where(self_mask, np.nan, d)  # drop the zero self-distance
        d_min, d_max = np.nanmin(d, axis=1), np.nanmax(d, axis=1)
        ring_b = (1 + ring) * d_min - 1.4 * d_max
        # face-edge cap: in face-local coords the four edges are the great
        # circles y=±x, z=±x; the center's arc distance to the nearest is
        # asin((x - max(|y|,|z|)) / √2). Subtract the circumradius slack so
        # any cross-face point (which the ring cannot cover) is provably
        # farther than the capped bound.
        cx, cy, cz = center[:, 0, 0], center[:, 0, 1], center[:, 0, 2]
        s = (cx - np.maximum(np.abs(cy), np.abs(cz))) / np.sqrt(2.0)
        edge_b = np.arcsin(np.clip(s, 0.0, 1.0)) * EARTH_RADIUS_M - 1.4 * d_max
        return pd.Series(np.maximum(0.0, np.minimum(ring_b, edge_b)))

    return _bound(cell)


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    k: int = 5,
    res: int = 7,
    ring: int = 2,
    query_id: str = "query_id",
    point_id: str = "point_id",
    broadcast_queries: bool = True,
    with_certificate: bool = False,
) -> DataFrame:
    """k nearest ``points`` for each query row.

    queries: (query_id, lat, lng); points: (point_id, lat, lng).
    Returns (query_id, rank, point_id, dist_m[, exact]).

    Exactness contract: results are exact when the true k-th neighbour lies
    inside the k-ring coverage; queries that find fewer than k candidates
    fall back to brute force and are always exact. With
    ``with_certificate=True`` every row carries a provable ``exact`` flag
    (conservative bound from ring_exactness_bound — certified ⇒ truly
    exact; tests pin no-false-certificates against brute force).
    """
    # Materialize both cell-annotated projections once: the ring phase, the
    # escalation phase and the brute tail each re-join these, and without
    # checkpointing every branch re-runs the h3x pandas_udf over the full
    # table (~36 ArrowEvalPython stages in the q21 plan — exchange reuse
    # covered part of it; measured 5.7 s → 5.3 s at sf0.1, and the win grows
    # with table size since the UDF scan is O(points) per branch). Per-call
    # materialization — no cross-run cache reuse.
    from cog3pio_spark.session import spread_small_scan

    # spread first: the h3x pandas_udf otherwise runs single-task on a
    # single-split input (no-op at real scale; measured 5.3→2.9 s at sf0.1)
    q_lazy = spread_small_scan(queries).select(
        query_id,
        F.col("lat").alias("q_lat"),
        F.col("lng").alias("q_lng"),
        C.h3x_cell(F.col("lat"), F.col("lng"), res).alias("q_cell"),
    )
    p_lazy = spread_small_scan(points).select(
        point_id,
        F.col("lat").alias("p_lat"),
        F.col("lng").alias("p_lng"),
        C.h3x_cell(F.col("lat"), F.col("lng"), res).alias("cell"),
    )
    # materialize the two projections CONCURRENTLY (guide §2.6 — actions
    # are sequential only because driver code calls them sequentially; the
    # two cell-annotation jobs are independent, so the second no longer
    # waits out the first's tail). Thread-pool jobs inherit nothing they
    # need here; each call returns its own checkpointed frame.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fq = pool.submit(lambda: q_lazy.localCheckpoint(eager=True))
        fp = pool.submit(lambda: p_lazy.localCheckpoint(eager=True))
        q, p = fq.result(), fp.result()

    w = Window.partitionBy(query_id).orderBy(F.col("dist_m").asc(), F.col(point_id).asc())

    def ring_phase(queries_df: DataFrame, ring_k: int) -> DataFrame:
        expanded = queries_df.withColumn(
            "cell", F.explode(C.h3x_kring(F.col("q_cell"), ring_k))
        )
        probe = F.broadcast(expanded) if broadcast_queries else expanded
        cand = probe.join(p, "cell")
        dist = cand.withColumn(
            "dist_m",
            haversine_m(F.col("q_lat"), F.col("q_lng"), F.col("p_lat"), F.col("p_lng")),
        )
        return (
            dist.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, "rank", point_id, "dist_m")
        )

    def shortfall(queries_df: DataFrame, result: DataFrame) -> DataFrame:
        found = result.groupBy(query_id).agg(F.count("*").alias("n_found"))
        return (
            queries_df.join(found, query_id, "left")
            .filter(F.coalesce(F.col("n_found"), F.lit(0)) < k)
            .drop("n_found")
        )

    # phase 1: base ring; phase 2: escalated ring (3×) for the queries that
    # came up short — at scale this keeps the brute tail (a full points
    # pass) to the rare truly-isolated queries. Each phase result is tiny
    # (≤ |queries|·k rows) and consumed by 2-3 downstream branches, so it is
    # checkpointed rather than recomputed per consumer.
    # lazy checkpoint (r6): the first consumer (the shortfall probe below)
    # materializes the phase result as a side effect of its own job, so the
    # synchronous eager barrier disappears while later consumers still read
    # the materialized blocks — one fewer scheduling round-trip per phase.
    ranked = ring_phase(q, ring).localCheckpoint(eager=False)
    short_q = shortfall(q, ranked)
    # r5: skip the escalation/brute machinery entirely when NO query came
    # up short (the common case — ring coverage is sized for it). The
    # isEmpty probes are one driver aggregate over a checkpointed
    # ≤|queries|-row frame each; what they skip is stage launches against
    # the FULL points table (the brute tail is a whole points pass at
    # scale). Measured ~4.0 → ~2.6 s warm on the sf0.1 ring query.
    if short_q.isEmpty():
        out = ranked
        short = short_q.select(query_id, "q_lat", "q_lng")
    else:
        escalated = ring_phase(short_q, ring * 3)
        ranked = (
            ranked.join(short_q.select(query_id), query_id, "left_anti")
            .unionByName(escalated)
            .localCheckpoint(eager=False)  # materialized by the next probe
        )
        short = shortfall(q, ranked).select(query_id, "q_lat", "q_lng")
        if short.isEmpty():
            out = ranked
        else:
            brute = (
                F.broadcast(short)
                .crossJoin(p.select(point_id, "p_lat", "p_lng"))
                .withColumn(
                    "dist_m",
                    haversine_m(
                        F.col("q_lat"), F.col("q_lng"), F.col("p_lat"), F.col("p_lng")
                    ),
                )
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select(query_id, "rank", point_id, "dist_m")
            )
            covered = ranked.join(short.select(query_id), query_id, "left_anti")
            out = covered.unionByName(brute)

    if not with_certificate:
        return out
    # out contains the brute crossJoin tail and feeds TWO branches below
    # (the kth aggregate and the cert base) — checkpoint so the full-points
    # brute pass executes once, not per consumer (r4 review; same pattern
    # as the phase results above). Only in the certificate path: the plain
    # return above has a single consumer.
    out = out.localCheckpoint(eager=True)
    # Exactness certificate: brute-forced queries are exact by construction;
    # ring-served queries are exact when their k-th distance is provably
    # inside the ring coverage (ring_exactness_bound). Conservative: a
    # certified row is always truly exact (tests pin this).
    bounds = q.select(query_id, ring_exactness_bound(F.col("q_cell"), ring).alias("_bound"))
    brute_ids = short.select(query_id).withColumn("_brute", F.lit(True))
    kth = out.groupBy(query_id).agg(F.max("dist_m").alias("_kth"))
    cert = (
        out.join(bounds, query_id)
        .join(kth, query_id)
        .join(brute_ids, query_id, "left")
        .withColumn(
            "exact",
            F.coalesce(F.col("_brute"), F.lit(False))
            | (F.col("_kth") <= F.col("_bound")),
        )
        .select(query_id, "rank", point_id, "dist_m", "exact")
    )
    return cert
