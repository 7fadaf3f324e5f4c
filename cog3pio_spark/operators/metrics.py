"""Per-partition metrics + golden-compare ops (SURVEY §2.B UDF surface:
``mapInPandas`` with the task's partition id — NOT applyInPandas/groupBy,
whose missing-group shape hid empty partitions; see partition_metrics).

``partition_metrics`` emits one row per physical partition with row counts,
byte estimates and per-partition key ranges — the lineage/metrics payload the
checkpoint manifest stores (north_rule "per-partition lineage + metrics").

``golden_compare`` is the two-way exceptAll golden-file contract used by the
golden tests (FIXTURES.md §4): order-insensitive equality with a row-count +
schema guard.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def partition_metrics(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """One row per physical partition: (partition_id, n_rows, key_lo, key_hi).

    Uses mapInPandas with the task's partitionId — EVERY physical partition
    emits exactly one row, including EMPTY ones (r4 review: the former
    groupBy(spark_partition_id) shape produced no group — hence no row —
    for empty partitions, hiding exactly the imbalance this function exists
    to surface). min/max are true partition key ranges (useful to verify
    repartitionByRange produced contiguous, balanced cell ranges).
    """
    schema = T.StructType(
        [
            T.StructField("partition_id", T.IntegerType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("approx_bytes", T.LongType()),
            T.StructField("key_lo", T.StringType()),
            T.StructField("key_hi", T.StringType()),
        ]
    )
    kc = key_col

    def per_partition(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        approx = 0
        lo = hi = None
        for pdf in batches:
            n += len(pdf)
            approx += int(pdf.memory_usage(deep=True).sum())
            if kc and len(pdf):
                blo, bhi = pdf[kc].min(), pdf[kc].max()
                # pd.isna guard (r5 review): an ALL-NULL batch yields
                # float NaN from .min()/.max(), which then either raises
                # TypeError against a later batch's string key or
                # silently reports 'nan' as the range for numeric keys
                if not pd.isna(blo):
                    lo = blo if lo is None else min(lo, blo)
                if not pd.isna(bhi):
                    hi = bhi if hi is None else max(hi, bhi)
        yield pd.DataFrame(
            {
                "partition_id": [pid],
                "n_rows": [n],
                "approx_bytes": [approx],
                "key_lo": [str(lo) if lo is not None else None],
                "key_hi": [str(hi) if hi is not None else None],
            }
        )

    return df.mapInPandas(per_partition, schema)


def golden_compare(actual: DataFrame, golden: DataFrame) -> dict:
    """Order-insensitive golden equality: schema names + row count + two-way
    exceptAll. Returns a verdict dict; tests assert verdict['match']."""
    a_cols, g_cols = sorted(actual.columns), sorted(golden.columns)
    if a_cols != g_cols:
        return {"match": False, "reason": f"schema {a_cols} != {g_cols}"}
    # localCheckpoint: each side feeds two exceptAll consumers — without
    # truncation an expensive actual pipeline re-executes per consumer
    # (r5 review: formerly FOUR executions incl. two standalone counts;
    # actual_rows is derivable via the multiset identity |A| = |G| −
    # missing + extra)
    a_sel = actual.select(*a_cols).localCheckpoint(eager=True)
    g_sel = golden.select(*g_cols).localCheckpoint(eager=True)
    missing = g_sel.exceptAll(a_sel).count()
    extra = a_sel.exceptAll(g_sel).count()
    golden_rows = g_sel.count()
    return {
        "match": missing == 0 and extra == 0,
        "missing_rows": missing,
        "extra_rows": extra,
        "actual_rows": golden_rows - missing + extra,
        "golden_rows": golden_rows,
    }
