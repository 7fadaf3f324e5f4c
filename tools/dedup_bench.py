"""Dedup-closure scale evidence (BENCH/BASELINE.md §round 4) — reproducible.

Generates a deterministic 400k-doc corpus with Zipf-ish duplicate clusters
(997 true content groups by construction, 10% near-dup variant rows), then
times the pair → components → keep-list pipeline and VERIFIES the closure
recovers exactly the true group count.

Usage: python tools/dedup_bench.py [n_docs]
Prints one JSON line; human logging on stderr.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    from pyspark.sql import functions as F

    from cog3pio_spark.operators.dedupe import (
        connected_components,
        dedupe_corpus,
        minhash_lsh_dupes,
    )
    from cog3pio_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sp = max(32, int(cpus) * 2) if cpus.isdigit() else 64  # '*' is valid
    spark = get_spark("dedup_bench", master=f"local[{cpus}]",
                      shuffle_partitions=sp)
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(n).select(
        F.concat(F.lit("doc"), F.lpad(F.col("id").cast("string"), 7, "0"))
        .alias("doc_id"),
        F.col("id"),
        # id^0.74 compression → Zipf-ish cluster sizes; text content keys on
        # cl % 997 inside the word formula, so TRUE content groups = 997
        F.pow(F.col("id").cast("double"), F.lit(0.74)).cast("long").alias("cl"),
    )
    words = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{k}_"),
                     ((F.col("cl") * (k * 2 + 3)) % 997).cast("string"))
            for k in range(40)
        ],
    )
    docs = base.select(
        "doc_id",
        F.when(
            F.col("id") % 10 == 0,
            F.concat(words, F.lit(" variant "), (F.col("id") % 7).cast("string")),
        ).otherwise(words).alias("text"),
    )
    # cache key carries a generator version hash (r5 review: a path keyed
    # only by n silently reused a STALE corpus after formula edits — bench
    # numbers and the closure_exact gate would test old data). BUMP the
    # version string whenever the corpus formula above changes.
    gen_sig = hashlib.sha256(
        b"v1|pow0.74|mod997|words40|variant10x7|%d" % n
    ).hexdigest()[:12]
    path = f"/tmp/dedup_bench_docs_{n}_{gen_sig}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs.write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    docs.count()  # warm

    t0 = time.perf_counter()
    # materialize: CC timing below must measure CLOSURE cost, not a lazy
    # re-execution of the whole minhash pipeline (r4 review — the first
    # recorded components_sec included a full pair recompute)
    pairs = minhash_lsh_dupes(docs, jaccard_threshold=0.5).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    t_pairs = time.perf_counter() - t0
    print(f"pairs: {n_pairs} in {t_pairs:.1f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    n_comp = connected_components(pairs).select("component").distinct().count()
    t_cc = time.perf_counter() - t0
    print(f"components: {n_comp} in {t_cc:.1f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    kept = dedupe_corpus(docs, jaccard_threshold=0.5).count()
    t_all = time.perf_counter() - t0

    result = {
        "n_docs": n,
        "pairs": n_pairs,
        "pairs_sec": round(t_pairs, 1),
        "components": n_comp,
        "components_sec": round(t_cc, 1),
        "kept": kept,
        "end_to_end_sec": round(t_all, 1),
        "docs_per_sec": round(n / t_all, 1),
        # closure-correctness gate: 997 true groups by construction
        "closure_exact": bool(n_comp == 997 == kept) if n >= 100_000 else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
