"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the flagship
spatial-join + tile-assignment pipeline on a seeded synthetic interleaved-doc
table, and prints ONE JSON line:

    {"metric": ..., "value": docs_per_sec, "unit": "docs/sec",
     "queries": {name: sec, ...}, "sf": ...}

All human-readable logging goes to stderr; stdout carries only the JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "2000000"))
FARM_DIR = os.environ.get(
    "SPARK_GRAFT_FARM_DIR", os.path.join(HERE, "tests", "fixtures", "tile_farm")
)

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_nation_revenue",
    "q06_cumulative_monthly_revenue",
    "q08_sessionization",
    "q13_dedupe_exact",
    "q14_text_features",
    "q16_ngram_jaccard",
    "q17_ann_topk",
    "q19_pip_boxes",
    "q20_knn",
    "q21_knn_ring",
    "q22_cell_assignment",
    "q23_minhash_dupes",
    "q24_simhash_dupes",
    "q31_cell_range_join",
    "q36_ivf_topk",
    "q38_curation",
    "q39_tile_covering",
    "q43_knn_sort_merge",
    "q47_top_pairs_blocked",
    "q48_ivf2_topk",
    "q51_embedding_dupes",
    "q52_ivfpq_topk",
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def prepare_docs_parquet(spark, n_docs: int) -> str:
    """Materialize the synthetic interleaved-doc table once (outside timing).

    The benchmark measures the *pipeline over a stored table* (north_rule
    input shape), not column-expression data generation.
    """
    from cog3pio_spark.fixtures.cogs import generate_tile_farm
    from cog3pio_spark.fixtures.docs import interleaved_docs

    path = os.path.join(FARM_DIR, "..", f"bench_docs_{n_docs}.parquet")
    path = os.path.abspath(path)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        refs = generate_tile_farm(FARM_DIR, n=400)
        parts = int(CPUS) * 4 if CPUS.isdigit() else 64
        log(f"materializing {n_docs} interleaved docs → {path}")
        interleaved_docs(spark, n_docs, refs, partitions=parts).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def run_spatial_pipeline(spark, n_docs: int) -> tuple[float, int]:
    """Flagship docs→tiles→cells→PIP→agg run; returns (sec, docs)."""
    from cog3pio_spark.fixtures.polygons import polygons_df
    from cog3pio_spark.plans.flagship import flagship_pipeline

    path = prepare_docs_parquet(spark, n_docs)
    docs = spark.read.parquet(path)
    polys = polygons_df(spark, 64)
    dts = []
    for run in range(4):  # run 0 warms Python workers + codegen (untimed)
        t0 = time.perf_counter()
        rows = flagship_pipeline(docs, polys).collect()
        dts.append(time.perf_counter() - t0)
        log(f"spatial pipeline run{run}: {n_docs} docs in {dts[-1]:.2f}s → {len(rows)} rows")
        # r4 review: a missing/stale tile farm makes every decode an error
        # row — the pipeline returns near-instantly and the headline would
        # silently inflate. Decode failures must FAIL the bench loudly.
        assert rows and any(r["n_tiles"] > 0 for r in rows), (
            "flagship produced no decoded tiles — tile farm missing/stale?"
        )
    # best of the 3 warm runs (criterion/codspeed convention): this box gets
    # periodic sibling-load pulses that can triple a single run; min over
    # warm runs measures the engine, not the pulse (r3 — earlier rounds
    # reported the single last run and caught pulses at random)
    return min(dts[1:]), n_docs


def main() -> None:
    import __spark_entry__ as E
    from pyspark.sql import functions as F
    from cog3pio_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(32, int(CPUS) * 2 if CPUS.isdigit() else 32))
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warm-up OUTSIDE any timed query (r3; same rationale as the
    # flagship's untimed run 1): without it the first timed query absorbs
    # ~3 s of one-time whole-stage-codegen + scan-path JIT that belongs to
    # the session, not the query. Disclosed: r1/r2 per-query numbers carry
    # that artifact in their first entry (q01).
    t0 = time.perf_counter()
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).groupBy(
        "l_returnflag"
    ).count().collect()
    log(f"warm-up (untimed): {time.perf_counter() - t0:.2f}s")

    # FLAGSHIP FIRST (r5): it is the headline metric and used to run last,
    # after ~4 min of per-query work — pinned localCheckpoint blocks,
    # accumulated shuffle files, and a much larger window for a sibling-load
    # pulse to land in. A fresh-session flagship matches how the driver's
    # smoke entry and tools/scaling.py measure the same pipeline.
    sec, docs = run_spatial_pipeline(spark, N_DOCS)
    docs_per_sec = docs / sec

    qs = E.queries()
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        # min of 2 (r5, disclosed in the JSON): this box takes sibling-load
        # pulses that swing the control job 1.2→5.9 s within an hour; a
        # single cold pass per query conflates the pulse with the engine.
        # Same convention as the flagship's min-of-3; run 1 additionally
        # absorbs the query's own first-use JIT.
        per = []
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn(spark, SF_DIR).count()
            per.append(time.perf_counter() - t0)
        times[name] = round(min(per), 3)
        log(f"{name}: {times[name]}s (runs {[round(t, 2) for t in per]}, {n} rows)")
    times["spatial_pipeline"] = round(sec, 3)

    # control job (VERDICT r3 #8): the same pure whole-stage-codegen
    # xxhash-sum job tools/scaling.py uses to measure the BOX, run inside
    # this bench's session — cross-round headline comparisons can then
    # normalize out sibling load / DRAM-contention swings (the r3 control
    # swung 0.76-0.96 between same-day runs). Min of 3 runs, untimed warm-up
    # excluded, ~3e9 rows matching scaling.py's CONTROL_ROWS.
    control_rows = 3_000_000_000
    ctrl_times = []
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")  # match scaling.py's
    try:  # session: the hash SUM wraps past long range by design
        for run in range(4):
            t0 = time.perf_counter()
            spark.range(control_rows, numPartitions=max(8, int(CPUS) * 8)).select(
                F.sum(F.xxhash64(F.col("id"), F.col("id") * 3, F.col("id") + 7))
            ).collect()
            if run:
                ctrl_times.append(time.perf_counter() - t0)
            log(f"control run{run}: {time.perf_counter() - t0:.2f}s")
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "spatial_join_tile_assignment_throughput",
                "value": round(docs_per_sec, 1),
                "unit": "docs/sec",
                "queries": times,
                # r5: per-query = min of 2 runs (was 1 cold pass; flagship
                # stays min of 3 warm) — pulse-resistant, disclosed here
                "query_timing": "min_of_2",
                # r5: these queries now run in-gate verification work
                # (dual-implementation diffs / invariant aggregations) on
                # top of the operator — their times are NOT comparable to
                # pre-r5 rounds (disclosed so cross-round readers don't
                # attribute the delta to the engine)
                "changed_queries_r5": [
                    "q22_cell_assignment", "q24_simhash_dupes",
                    "q31_cell_range_join", "q39_tile_covering",
                ],
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_docs": docs,
                "cpus": CPUS,
                "control": {
                    "sec": round(min(ctrl_times), 3),
                    "rows": control_rows,
                    "job": "sum(xxhash64(id,id*3,id+7)) — scaling.py control",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
