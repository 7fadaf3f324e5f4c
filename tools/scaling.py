"""Scaling-efficiency evidence (north_rule / BASELINE.md sandbox rule).

Measures the flagship spatial-join + tile-assignment job on the SAME
materialized input across a parallelism CURVE (local[1] → local[4] →
local[16] → local[32]), plus a pure whole-stage-codegen control job
(range → xxhash64 → sum: zero engine code, embarrassingly parallel) at the
same levels. Reports throughput at every level and the N→4N efficiency for
each quadrupling, alongside the control job's ceiling at the same pair.

Why a curve and a control, not one pair: the sandbox replaces "N executors →
4N executors" with threads on ONE box that share a single DRAM bus and OS.
A scan-heavy job saturates that bus near the core count; the control job
shows the box's own ceiling (measured ≈0.85 at 4→16, ≈0.79 at 8→32 — even
zero-engine-code Spark cannot scale past it here). On a real cluster each
executor brings its own memory bandwidth, so the low-core pairs (1→4, 4→16),
where the bus is not yet saturated, are the faithful model of N→4N
*executors*; the high-core pairs measure the box, not the engine. All pairs
are reported; nothing is hidden.

Per level: WARMUPS runs discarded (Python worker pool + JIT + page cache),
then median of RUNS. Each level runs in a fresh subprocess (own JVM) —
reusing one JVM across differently-sized contexts skewed the later level by
~60% in testing.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "40000000"))
LEVELS = [int(x) for x in os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "1,4,16,32").split(",")]
RUNS = 3
# Everything in BENCH/BASELINE.md from this line on is hand-written and
# survives regeneration.
MANUAL_MARKER = "<!-- manual sections below: preserved by tools/scaling.py -->"
WARMUPS = 3
CONTROL_ROWS = 3_000_000_000

# Identical conf at every level. maxPartitionBytes sized for the local input
# (a few GB) so the scan yields ≥3×cores splits even at the highest level —
# with the 128 MB cluster default, parallelism was capped by file packing
# (measured 0.37 efficiency from that artifact alone).
_CONF = {"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)}


def _runs_for(cpus: int) -> tuple[int, int]:
    # local[1] runs are long and JIT-stable after one pass
    return (1, 2) if cpus == 1 else (WARMUPS, RUNS)


def _level_flagship(cpus: int, docs_path: str) -> dict:
    from cog3pio_spark.fixtures.polygons import polygons_df
    from cog3pio_spark.plans.flagship import flagship_pipeline
    from cog3pio_spark.session import get_spark

    spark = get_spark(
        f"scaling-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus * 2), extra_conf=_CONF,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(docs_path)
    polys = polygons_df(spark, 64)
    warm, runs = _runs_for(cpus)
    times = []
    for run in range(warm + runs):
        t0 = time.perf_counter()
        rows = flagship_pipeline(docs, polys).collect()
        dt = time.perf_counter() - t0
        # r5 review: same loud guard as bench.py — a missing/stale tile farm
        # makes every decode an error row, the pipeline's polygon_id filter
        # drops them all, and the level would "finish" near-instantly,
        # silently inflating the published scaling numbers. RuntimeError,
        # not assert: python -O strips asserts (second r5 sweep).
        if not (rows and any(r["n_tiles"] > 0 for r in rows)):
            raise RuntimeError(
                "flagship produced no decoded tiles — tile farm missing/stale?"
            )
        if run >= warm:
            times.append(dt)
        print(f"  local[{cpus}] flagship run{run}: {dt:.2f}s", file=sys.stderr, flush=True)
    spark.stop()
    med = statistics.median(times)
    return {"cpus": cpus, "runs_sec": [round(t, 3) for t in times],
            "median_sec": round(med, 3), "docs_per_sec": round(N_DOCS / med, 1)}


def _level_control(cpus: int) -> dict:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sp = (
        SparkSession.builder.master(f"local[{cpus}]").appName(f"control-{cpus}")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.ansi.enabled", "false")
        .getOrCreate()
    )
    sp.sparkContext.setLogLevel("ERROR")

    def job():
        (
            sp.range(CONTROL_ROWS, numPartitions=max(8, cpus * 8))
            .select(F.sum(F.xxhash64(F.col("id"), F.col("id") * 3, F.col("id") + 7)))
            .collect()
        )

    warm, runs = _runs_for(cpus)
    warm = min(warm, 1)
    times = []
    for run in range(warm + runs):
        t0 = time.perf_counter()
        job()
        dt = time.perf_counter() - t0
        if run >= warm:
            times.append(dt)
        print(f"  local[{cpus}] control run{run}: {dt:.2f}s", file=sys.stderr, flush=True)
    sp.stop()
    med = statistics.median(times)
    return {"cpus": cpus, "median_sec": round(med, 3)}


def _subprocess_level(kind: str, cpus: int, docs_path: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), f"--{kind}", str(cpus), docs_path],
        capture_output=True, text=True, env={**os.environ}, cwd=HERE,
    )
    for line in out.stderr.splitlines():
        print(line, file=sys.stderr)
    if out.returncode != 0:
        # r5 review: check=True swallowed the child's Spark traceback — a
        # multi-minute level that OOMs must die showing WHY
        raise RuntimeError(
            f"scaling level --{kind} {cpus} failed (rc={out.returncode}); "
            f"stderr tail:\n" + "\n".join(out.stderr.splitlines()[-25:])
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _prepare() -> str:
    import bench
    from cog3pio_spark.session import get_spark

    sp = get_spark("scaling-prep", master="local[32]")
    sp.sparkContext.setLogLevel("ERROR")
    docs_path = bench.prepare_docs_parquet(sp, N_DOCS)
    sp.stop()
    return docs_path


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--flagship":
        print(json.dumps(_level_flagship(int(sys.argv[2]), sys.argv[3])))
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "--control":
        print(json.dumps(_level_control(int(sys.argv[2]))))
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "--prepare":
        print(_prepare())
        return

    prep = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--prepare"],
        capture_output=True, text=True, env={**os.environ}, cwd=HERE,
    )
    if prep.returncode != 0:
        raise RuntimeError(
            f"scaling --prepare failed (rc={prep.returncode}); stderr tail:\n"
            + "\n".join(prep.stderr.splitlines()[-25:])
        )
    docs_path = prep.stdout.strip().splitlines()[-1]

    flag = {c: _subprocess_level("flagship", c, docs_path) for c in LEVELS}
    ctrl = {c: _subprocess_level("control", c, docs_path) for c in LEVELS}

    pairs = []
    # sorted: the headline is the LOWEST (pre-saturation) pair regardless of
    # the order LEVELS was specified in (r5 review — env "32,16,4,1" would
    # otherwise promote the bus-contended pair to the pass/fail gate)
    for n in sorted(LEVELS):
        if n * 4 in flag:
            sp_f = flag[n]["median_sec"] / flag[n * 4]["median_sec"]
            sp_c = ctrl[n]["median_sec"] / ctrl[n * 4]["median_sec"]
            pairs.append(
                {
                    "pair": f"{n}->{n*4}",
                    "flagship_speedup": round(sp_f, 3),
                    "flagship_efficiency": round(sp_f / 4, 3),
                    "control_speedup": round(sp_c, 3),
                    "control_efficiency": round(sp_c / 4, 3),
                    "relative_to_ceiling": round(sp_f / sp_c, 3),
                }
            )
    headline = pairs[0] if pairs else None  # lowest pair = pre-saturation model

    result = {
        "n_docs": N_DOCS,
        "levels": {str(c): flag[c] for c in LEVELS},
        "control": {str(c): ctrl[c] for c in LEVELS},
        "pairs": pairs,
        "headline_pair": headline["pair"] if headline else None,
        "scaling_efficiency": headline["flagship_efficiency"] if headline else None,
        "target": 0.8,
        "pass": bool(headline and headline["flagship_efficiency"] >= 0.8),
    }
    print(json.dumps(result, indent=2))
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)

    rows = "\n".join(
        f"| local[{c}] | {flag[c]['median_sec']:.2f} s | {flag[c]['docs_per_sec']:,.0f} docs/s "
        f"| {ctrl[c]['median_sec']:.2f} s |"
        for c in LEVELS
    )
    prow = "\n".join(
        f"| {p['pair']} | {p['flagship_speedup']:.2f}× | **{p['flagship_efficiency']:.3f}** "
        f"| {p['control_speedup']:.2f}× | {p['control_efficiency']:.3f} | {p['relative_to_ceiling']:.2f} |"
        for p in pairs
    )
    md = f"""# BENCH/BASELINE.md — measured engine numbers (sandbox evidence)

## Scaling efficiency (north_rule: ≥ 0.8 from N to 4N)

Same job (flagship spatial-join + tile-assignment pipeline), same input
({N_DOCS:,} interleaved docs, 400-tile farm, 64 polygons), full parallelism
curve, each level in a fresh JVM; steady state = median of {RUNS} runs after
warm-up. The control job (range → xxhash64 → sum; zero engine code) bounds
what ANY Spark job can achieve on this box at each pair — threads on one box
share a single DRAM bus, so high-core pairs measure the machine, not the
engine; on a real multi-executor cluster every executor adds its own memory
bus, which the low-core pairs model faithfully.

| level | flagship median | flagship throughput | control median |
|---|---|---|---|
{rows}

| pair (N→4N) | flagship speedup | flagship efficiency | control speedup | control (box ceiling) | flagship / ceiling |
|---|---|---|---|---|---|
{prow}

**Headline (pre-saturation N→4N pair, {headline['pair'] if headline else '-'}):
efficiency = {headline['flagship_efficiency'] if headline else float('nan'):.3f}**
(target ≥ 0.8: {"PASS" if result['pass'] else "MISS"}).
All pairs reported above; nothing withheld.

Reproduce: `python tools/scaling.py`
(env: SPARK_GRAFT_SCALING_DOCS, SPARK_GRAFT_SCALING_LEVELS).
"""
    # preserve hand-written sections below the marker across regenerations
    out_path = os.path.join(HERE, "BENCH", "BASELINE.md")
    manual = ""
    if os.path.exists(out_path):
        prev = open(out_path).read()
        if MANUAL_MARKER in prev:
            manual = prev[prev.index(MANUAL_MARKER):]
    with open(out_path, "w") as f:
        f.write(md)
        if manual:
            f.write("\n" + manual)
    print("wrote BENCH/BASELINE.md", file=sys.stderr)


if __name__ == "__main__":
    main()
