"""Stage isolation probe for q16_ngram_jaccard (guide §1.4 noop sink).

Times each stage of ngram_jaccard_pairs separately on $SPARK_GRAFT_SF_DIR.
Not part of the bench contract.
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F

from cog3pio_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/bigsf")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def t(spark, label, df):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    return dt


def main():
    spark = get_spark("probe_q16", master=f"local[{CPUS}]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.groupBy("lang").count().collect()  # warm

    n = 3
    text_col, id_col = "text", "doc_id"
    from cog3pio_spark.operators.dedupe import _spread_small_scan

    # current shape: words recomputed inside the HOF lambda
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams_cur = _spread_small_scan(docs).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
                    lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, n))),
                )
            )
        ).alias("gram"),
    ).filter(F.size(words) >= n)
    t(spark, "grams_current", grams_cur)
    t(spark, "grams_current_2", grams_cur)

    # candidate: project words once, lambda only slices the bound column
    pre = _spread_small_scan(docs).select(
        F.col(id_col), words.alias("_w")
    ).filter(F.size("_w") >= n)
    grams_proj = pre.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("_w") - n),
                    lambda i: F.xxhash64(F.concat_ws(" ", F.slice("_w", i + 1, n))),
                )
            )
        ).alias("gram"),
    )
    t(spark, "grams_projected_words", grams_proj)
    t(spark, "grams_projected_words_2", grams_proj)

    # sanity: same multiset?
    d = grams_cur.exceptAll(grams_proj).count() + grams_proj.exceptAll(grams_cur).count()
    print(f"diff={d}", file=sys.stderr)

    # full current query for reference
    from cog3pio_spark.operators.dedupe import ngram_jaccard_pairs
    q = ngram_jaccard_pairs(docs, n=3, threshold=0.10).orderBy("id_a", "id_b")
    t(spark, "q16_full", q)


if __name__ == "__main__":
    main()
