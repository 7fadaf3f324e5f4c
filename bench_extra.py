"""Per-query isolation bench + plan capture (optimization round 6).

NOT the driver bench — bench.py is frozen for measurement. This harness
exists so individual queries can be timed and their physical plans captured
without editing bench.py (guide §1: measure first, label jobs, capture
explain("formatted")).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        [--plans plans/r06 --suffix before] [--runs 2] [q16_ngram_jaccard ...]

With no query names: runs every BENCH_QUERIES entry from bench.py.
Prints one JSON line {"queries": {name: min_sec}, "sf": ..., "control": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: bench.py list)")
    ap.add_argument("--plans", default=None, help="dir to write <q>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--flagship", action="store_true", help="also run the flagship pipeline")
    ap.add_argument("--no-time", action="store_true", help="plans only, skip timing")
    args = ap.parse_args()

    import __spark_entry__ as E
    from bench import BENCH_QUERIES, run_spatial_pipeline
    from pyspark.sql import functions as F
    from cog3pio_spark.session import get_spark

    spark = get_spark(
        "bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(32, int(CPUS) * 2 if CPUS.isdigit() else 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).groupBy(
        "l_returnflag"
    ).count().collect()
    log(f"warm-up (untimed): {time.perf_counter() - t0:.2f}s")

    names = args.names or BENCH_QUERIES
    qs = E.queries()
    out: dict = {}

    flagship_sec = None
    if args.flagship:
        n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "2000000"))
        sec, _ = run_spatial_pipeline(spark, n_docs)
        flagship_sec = round(sec, 3)
        out["spatial_pipeline"] = flagship_sec

    for name in names:
        fn = qs[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, SF_DIR)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(mode))
        if args.no_time:
            continue
        per = []
        n = None
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            n = fn(spark, SF_DIR).count()
            per.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(min(per), 3)
        log(f"{name}: {out[name]}s (runs {[round(t, 2) for t in per]}, {n} rows)")

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # control job (box-load normalizer, matches bench.py/scaling.py)
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    ctrl = []
    try:
        for run in range(2):
            t0 = time.perf_counter()
            spark.range(3_000_000_000, numPartitions=max(8, int(CPUS) * 8)).select(
                F.sum(F.xxhash64(F.col("id"), F.col("id") * 3, F.col("id") + 7))
            ).collect()
            ctrl.append(time.perf_counter() - t0)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
    print(json.dumps({
        "queries": out,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "control": round(min(ctrl), 3),
    }))


if __name__ == "__main__":
    main()
