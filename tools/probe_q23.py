"""Stage isolation probe for q23_minhash_dupes (guide §1.4 noop sink)."""

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
    print(f"{label}: {dt:.2f}s", file=sys.stderr, flush=True)
    spark.sparkContext.setJobDescription(None)
    return dt


def main():
    spark = get_spark("probe_q23", master=f"local[{CPUS}]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.groupBy("lang").count().collect()  # warm

    from cog3pio_spark.operators.text import fingerprint
    from cog3pio_spark.operators.dedupe import minhash_signature, minhash_lsh_dupes

    # stage 1: fingerprint + reps agg
    reps = (
        docs.select("doc_id", "text", fingerprint(F.col("text")).alias("_sh"))
        .groupBy("_sh")
        .agg(F.min("doc_id").alias("doc_id"), F.min_by("text", F.col("doc_id")).alias("text"))
    )
    t(spark, "reps_agg", reps)
    t(spark, "reps_agg_2", reps)

    thin = docs.select("doc_id", fingerprint(F.col("text")).alias("_sh"))
    t(spark, "thin_fp", thin)

    # stage 2: signature UDF over representatives
    sig = reps.select("doc_id", minhash_signature(F.col("text"), 64, 5).alias("sig"))
    t(spark, "sig_udf", sig)
    t(spark, "sig_udf_2", sig)

    # full
    for i in range(2):
        q = minhash_lsh_dupes(docs, jaccard_threshold=0.5)
        t(spark, f"q23_full_{i}", q)


if __name__ == "__main__":
    main()
