"""Scaling-efficiency evidence run (north_rule / BASELINE.md sandbox rule).

Runs the SAME flagship job on the SAME materialized input at local[8] and
local[32] (N and 4N cores — the sandbox stand-in for N vs 4N executors),
reports steady-state throughput at both plus efficiency = (T_N / T_4N) / 4,
and rewrites the measured section of BENCH/BASELINE.md.

Steady-state protocol: per parallelism level, one warm-up run (Python worker
pool spin-up + whole-stage codegen), then the median of 3 timed runs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "40000000"))
RUNS = 3

# Identical conf at both levels. maxPartitionBytes is sized for the local
# input (a few GB), not the 128 MB cluster default: the scan must produce
# ≥ 3×cores splits at the larger level or parallelism is capped by file
# packing, not by the engine (this exact failure measured 0.37 efficiency
# before the fix).
_CONF = {"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)}


def run_level(cpus: int, docs_path: str) -> dict:
    from cog3pio_spark.fixtures.polygons import polygons_df
    from cog3pio_spark.plans.flagship import flagship_pipeline
    from cog3pio_spark.session import get_spark

    spark = get_spark(
        f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus * 2,
        extra_conf=_CONF,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(docs_path)
    polys = polygons_df(spark, 64)

    times = []
    for run in range(RUNS + 1):
        t0 = time.perf_counter()
        flagship_pipeline(docs, polys).collect()
        dt = time.perf_counter() - t0
        if run > 0:  # run 0 = warm-up
            times.append(dt)
        print(f"  local[{cpus}] run{run}: {dt:.2f}s", file=sys.stderr, flush=True)
    spark.stop()
    med = statistics.median(times)
    return {"cpus": cpus, "runs_sec": [round(t, 3) for t in times],
            "median_sec": round(med, 3), "docs_per_sec": round(N_DOCS / med, 1)}


def main() -> None:
    # materialize input once with a throwaway session
    import bench
    from cog3pio_spark.session import get_spark

    sp = get_spark("scaling-prep", master="local[32]")
    sp.sparkContext.setLogLevel("ERROR")
    docs_path = bench.prepare_docs_parquet(sp, N_DOCS)
    sp.stop()

    low = run_level(8, docs_path)
    high = run_level(32, docs_path)
    speedup = low["median_sec"] / high["median_sec"]
    eff = speedup / 4.0
    result = {
        "n_docs": N_DOCS,
        "local8": low,
        "local32": high,
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result, indent=2))
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)

    md = f"""# BENCH/BASELINE.md — measured engine numbers (sandbox evidence)

## Scaling efficiency (north_rule: ≥ 0.8 from N to 4N)

Same job (flagship spatial-join + tile-assignment pipeline), same input
({N_DOCS:,} interleaved docs, 400-tile farm, 64 polygons), two parallelism
levels. Steady state = median of {RUNS} runs after 1 warm-up.

| level | median wall | throughput |
|---|---|---|
| local[8]  (N)  | {low['median_sec']:.2f} s | {low['docs_per_sec']:,.0f} docs/sec |
| local[32] (4N) | {high['median_sec']:.2f} s | {high['docs_per_sec']:,.0f} docs/sec |

speedup 8→32 = {speedup:.2f}×, **scaling efficiency = {eff:.3f}**
(target ≥ 0.8: {"PASS" if eff >= 0.8 else "MISS"})

Raw runs: local[8] {low['runs_sec']}, local[32] {high['runs_sec']}.
Reproduce: `python tools/scaling.py` (env SPARK_GRAFT_SCALING_DOCS to resize).
"""
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print("wrote BENCH/BASELINE.md", file=sys.stderr)


if __name__ == "__main__":
    main()
