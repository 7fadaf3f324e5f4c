"""AvailableNow streaming ingest over the interleaved-doc table.

Batch/stream parity: the transformation body is the same media-span explode
used by plans/flagship.py, so a row that flows through the stream and the
same row processed in batch produce identical span rows (tested in
tests/test_streaming.py). Late data is handled with a watermark on the
ingest timestamp; counts use tumbling windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def doc_stream_schema() -> T.StructType:
    span = T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
    return T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("spans", T.ArrayType(span)),
            T.StructField("ingest_ts", T.TimestampType()),
        ]
    )


def available_now_ingest(
    spark: SparkSession, input_dir: str, checkpoint_dir: str, out_dir: str
) -> None:
    """Drain all currently-available doc files exactly once, writing media
    spans to parquet. Re-running resumes from the stream checkpoint —
    streaming-native lineage complementing the batch manifest.

    SINK SCHEMA NOTE (r5): the constant 'kind' column was dropped from the
    output. Resuming into a sink directory written by a pre-r5 version
    mixes schemas — read such sinks with mergeSchema=true (or start a
    fresh sink dir), otherwise footer-inference may resolve the OLD schema
    and new files read kind=null, silently failing kind=='media' filters."""
    stream = (
        spark.readStream.schema(doc_stream_schema())
        .format("parquet")
        .load(input_dir)
    )
    spans = (
        stream.select("doc_id", "ingest_ts", F.posexplode("spans").alias("pos", "span"))
        .select(
            "doc_id",
            "ingest_ts",
            "pos",
            F.col("span.kind").alias("kind"),
            F.col("span.media_ref").alias("media_ref"),
        )
        .filter(F.col("kind") == "media")
        # r5 review: after the filter 'kind' is the constant 'media' on
        # every row — drop it from the sink (doc_media_refs in
        # plans/flagship.py drops it too; batch/stream schema parity)
        .drop("kind")
    )
    q = (
        spans.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def first_seen_media_refs(
    docs_stream: DataFrame, checkpoint_dir: str, out_dir: str
) -> None:
    """Stateful streaming dedupe: emit each media_ref exactly once across
    ALL micro-batches (custom stateful operator via applyInPandasWithState —
    SURVEY §2.B UDF surface / task-brief streaming-state path).

    State per media_ref: a seen flag + first-seen count. Unlike
    dropDuplicates-in-stream (state grows unbounded with watermark quirks),
    the handler owns its state shape and could evict by custom policy.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    spans = (
        docs_stream.select(F.explode("spans").alias("span"))
        .filter(F.col("span.kind") == "media")
        .select(F.col("span.media_ref").alias("media_ref"))
    )

    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("first_batch_rows", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("seen", T.LongType())])

    def handler(key, pdfs, state: GroupState):
        if state.exists:
            # already emitted: NO state write (r4 review — accumulating a
            # never-read running count paid a state-store write for the
            # hottest refs in every micro-batch, pure dead churn on exactly
            # the Zipf keys that dominate batches)
            return iter(())
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"media_ref": [key[0]], "first_batch_rows": [n]})

    deduped = spans.groupBy("media_ref").applyInPandasWithState(
        handler, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_media_counts(docs_stream: DataFrame, window: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window media-span counts (late data ≤ 1 window)."""
    spans = docs_stream.select(
        "ingest_ts", F.explode("spans").alias("span")
    ).filter(F.col("span.kind") == "media")
    return (
        spans.withWatermark("ingest_ts", window)
        .groupBy(F.window("ingest_ts", window).alias("win"), F.col("span.media_ref").alias("media_ref"))
        .agg(F.count("*").alias("n_spans"))
    )


def streaming_flagship(
    docs_stream: DataFrame,
    polygons: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    prune_text: bool = False,
) -> None:
    """Continuous ingest of the FLAGSHIP pipeline (r3): each micro-batch of
    interleaved docs runs the exact batch operator chain — span explode →
    media_ref pre-agg + HLL doc sketches → fused decode/assign/PIP kernel →
    per-polygon rollup — via foreachBatch against the static polygon layer.

    Output is one per-polygon aggregate row set PER EPOCH, partitioned by
    ``_epoch`` with dynamic partition overwrite, so a replayed batch
    overwrites its own partition (idempotent, same contract as
    streaming_knn). Epoch rows are incremental rollups: exactly what the
    batch pipeline produces on that epoch's documents (parity pinned in
    tests/test_streaming.py::test_streaming_flagship_matches_batch).
    Cross-epoch totals are a plain second-stage groupBy for the additive
    columns (n_spans, sum_tile_mean — per-span quantities partition across
    epochs). n_docs AND n_tiles are WITHIN-epoch only: n_docs is the HLL
    estimate (the pipeline emits the estimate, not the sketch), and n_tiles
    counts distinct (media_ref, polygon) rows — a media_ref referenced from
    documents in two epochs is decoded and counted in BOTH, so summing
    per-epoch n_tiles double-counts shared refs (r5 review). Callers
    needing global distinct docs or tiles run the batch pipeline over the
    drained table.
    """
    from cog3pio_spark.plans.flagship import flagship_pipeline

    def _batch(df: DataFrame, epoch_id: int) -> None:
        if df.isEmpty():
            return
        (
            flagship_pipeline(df, polygons, prune_text=prune_text)
            .withColumn("_epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(out_dir)
        )

    q = (
        docs_stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_knn(
    query_stream: DataFrame,
    points: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 3,
    res: int = 7,
    ring: int = 2,
) -> None:
    """Streaming kNN: each micro-batch of query points runs the SAME ring
    kNN operator as batch (operators/knn.knn_join) against the static point
    table via foreachBatch — exact stream/batch parity by construction
    (top-k-per-query ranking isn't expressible as a pure streaming agg, so
    micro-batch enrichment is the idiomatic shape). Resume comes from the
    stream checkpoint, and the sink is IDEMPOTENT per epoch: results are
    partitioned by _epoch and written with dynamic partition overwrite, so a
    batch replayed after a crash-between-write-and-commit overwrites its own
    partition instead of appending duplicates (foreachBatch alone is only
    at-least-once).
    """
    from pyspark.sql import functions as F  # noqa: F811 (worker import)

    from cog3pio_spark.operators.knn import knn_join

    def _batch(df: DataFrame, epoch_id: int) -> None:
        if df.isEmpty():
            return
        # overwrite mode scoped to the write (ADVICE r2: a session-level
        # conf mutation would silently change later static overwrites)
        (
            knn_join(df, points, k=k, res=res, ring=ring)
            .withColumn("_epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(out_dir)
        )

    q = (
        query_stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
