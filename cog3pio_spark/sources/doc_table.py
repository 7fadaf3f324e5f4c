"""Interleaved doc-table source/sink: Iceberg when available, parquet else.

north_rule mandates Iceberg tables at 10^12-doc scale (snapshot isolation,
hidden partitioning on cell ranges, metadata-level pruning). The sandbox
ships no Iceberg runtime jar, so the same call sites transparently fall back
to parquet with the identical schema and an explicit partition layout —
``partitionBy(bucket-ish key)`` standing in for Iceberg's
``partitionedBy(bucket(N, media_ref))`` transform. The switch is a runtime
capability probe, not a config flag, so the code path is identical in both
environments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_doc_table(spark: SparkSession, location: str) -> DataFrame:
    """Read the interleaved docs table from an Iceberg table name/path or a
    parquet directory (sandbox fallback)."""
    if _iceberg_available(spark) and not location.endswith(".parquet"):
        try:
            return spark.read.format("iceberg").load(location)
        except Exception:
            pass
    return spark.read.parquet(location)


def write_doc_table(
    df: DataFrame,
    location: str,
    mode: str = "overwrite",
    bucket_col: str = "doc_id",
    n_buckets: int = 64,
) -> None:
    """Write the docs table with an explicit bucket partition layout.

    Iceberg: ``bucket(n, doc_id)`` hidden partitioning. Parquet fallback:
    materialized ``_bucket`` column + partitionBy — same pruning behavior
    for bucket-key lookups, visible instead of hidden.
    """
    spark = df.sparkSession
    if _iceberg_available(spark) and not location.endswith(".parquet"):
        try:
            writer = df.writeTo(location).using("iceberg").partitionedBy(
                F.bucket(n_buckets, F.col(bucket_col))
            )
            # honor mode on the Iceberg path too (r4 review: createOrReplace
            # for mode='append' REPLACED the whole table — silent data loss
            # on exactly the production path this module exists for)
            if mode == "append":
                writer.append()
            else:
                writer.createOrReplace()
            return
        except Exception:
            pass
    (
        df.withColumn(
            "_bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets)).cast("int")
        )
        .write.mode(mode)
        .partitionBy("_bucket")
        .parquet(location)
    )
