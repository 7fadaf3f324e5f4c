"""Training-data curation pipeline (task brief: dedup + quality + lang-id
as first-class components).

    documents → text features (tokens/quality/lang, JVM column math)
              → quality gate
              → exact dedupe (min doc_id per normalized content)
              → per-language corpus stats

Shuffle inventory: ONE shuffle (window over the sha2-256 content
fingerprint for the dedupe — a 64-char key, the price of collision-free
'exact' semantics at 10¹² docs; r4), then a partial-agg shuffle over the
deduped survivors. Quality and
lang-id are pure codegen; nothing crosses into Python.

Fully SQL-expressible ⇒ oracle-checked end-to-end by the driver
(q38_curation in __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cog3pio_spark.operators.text import fingerprint, lang_id, quality_score, token_count


def curate(docs: DataFrame, min_quality: float = 0.5, text_col: str = "text") -> DataFrame:
    """Quality-gated, exact-deduped docs with predicted language."""
    t = F.col(text_col)
    feat = docs.withColumns(
        {
            "quality": quality_score(t),
            "lang_pred": lang_id(t),
            "n_tokens": token_count(t),
            # sha2-256 content fingerprint (r4 review: the former 64-bit
            # xxhash64 key gives ~10⁴ expected birthday collisions at the
            # 10¹²-doc design point — thousands of NON-duplicate docs
            # silently dropped as 'exact' dupes; 256 bits makes collision
            # probability negligible and reuses the text.fingerprint helper
            # that was imported for exactly this)
            "fp": fingerprint(t),
        }
    ).filter(F.col("quality") >= min_quality)
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        feat.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "fp")
    )


def corpus_stats(docs: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """Per-predicted-language stats of the curated corpus."""
    from pyspark.sql import types as T

    kept = curate(docs, min_quality)
    return kept.groupBy("lang_pred").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        # decimal sum: exact + partition-order independent (oracle contract)
        F.sum(F.col("quality").cast(T.DecimalType(18, 6))).cast("double").alias("sum_quality"),
        F.min("doc_id").alias("first_doc"),
    )
