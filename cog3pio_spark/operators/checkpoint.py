"""Partition-manifest checkpointing: per-partition lineage + resume
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics").

Protocol (batch, deterministic — SURVEY §2.B sinks / §4.2):

1. Work is keyed by an explicit partition column (``part_key``, normally an
   S2 prefix from range partitioning).
2. ``write_checkpointed`` processes only keys absent from the manifest
   (left_anti), appends results partitioned by key, then appends one manifest
   row per completed key with metrics (rows, bytes est., key range).
3. A killed job re-runs with the same arguments: completed keys are skipped
   (idempotent), partially-written data files for incomplete keys are
   overwritten by dynamic partition overwrite.

The manifest is tiny (one row per partition key) — reading it is a driver
metadata op, never a scan of the data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def manifest_path(base: str) -> str:
    return os.path.join(base, "_manifest")


def data_path(base: str) -> str:
    return os.path.join(base, "data")


def load_manifest(spark: SparkSession, base: str) -> DataFrame | None:
    p = manifest_path(base)
    try:
        return spark.read.parquet(p)
    except Exception:
        return None


def write_checkpointed(
    df: DataFrame,
    base: str,
    part_col: str = "part_key",
) -> dict:
    """Write ``df`` partitioned by ``part_col`` with manifest-based resume.

    Returns {"written_keys": n, "skipped_keys": n, "rows": n}.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    manifest = load_manifest(spark, base)
    skipped = 0
    done = None
    if manifest is not None:
        done = manifest.select(F.col("part_key_done").alias(part_col)).distinct()
        skipped = done.count()
        df = df.join(F.broadcast(done), part_col, "left_anti")

    if df.isEmpty():
        return {"written_keys": 0, "skipped_keys": skipped, "rows": 0}

    # ONE execution of the (possibly nondeterministic) upstream: the write.
    # Manifest metrics are then derived from the durable output itself, so
    # n_rows can never disagree with the parquet data (ADVICE r1 — three
    # separate executions could diverge under row_number ties / sampling).
    (
        df.write.mode("overwrite")
        .partitionBy(part_col)
        .parquet(data_path(base))
    )
    # Exclude already-done keys with a NOT-isin literal filter (the manifest
    # is one row per key by design, so the list is bounded): unlike an
    # anti-join, a literal partition-column predicate prunes at file-listing
    # time, keeping each incremental resume O(new keys), not O(all data).
    written = spark.read.parquet(data_path(base))
    if done is not None:
        done_keys = [r[part_col] for r in done.collect()]
        if done_keys:
            written = written.filter(~F.col(part_col).isin(done_keys))
    metric_rows = written.groupBy(part_col).agg(F.count("*").alias("n_rows")).collect()
    total_rows = sum(r["n_rows"] for r in metric_rows)
    from pyspark.sql import types as T

    manifest_schema = T.StructType(
        [
            T.StructField("part_key_done", written.schema[part_col].dataType),
            T.StructField("n_rows", T.LongType()),
        ]
    )
    (
        spark.createDataFrame(
            [(r[part_col], r["n_rows"]) for r in metric_rows], manifest_schema
        )
        .withColumn("completed_at", F.current_timestamp())  # metrics-only
        .write.mode("append")
        .parquet(manifest_path(base))
    )
    return {
        "written_keys": len(metric_rows),
        "skipped_keys": skipped,
        "rows": total_rows,
    }


def read_checkpointed(spark: SparkSession, base: str) -> DataFrame:
    return spark.read.parquet(data_path(base))
