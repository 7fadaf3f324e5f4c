"""Flagship spatial-join + tile-assignment pipeline.

    docs → posexplode(spans) → filter(kind='media')
         → dropDuplicates(media_ref) → decode (mapInArrow)
         → join back on media_ref (broadcast: distinct refs ≪ spans)
         → assign cells (S2 + hex res 5..12)
         → broadcast PIP join vs polygon layer
         → groupBy(polygon_id) aggregation

Shuffle inventory (SURVEY §3.4 node boundaries):
  1. dropDuplicates(media_ref)      — shuffle on media_ref, input = refs only
                                      (two narrow columns, not pixels)
  2. join decoded↔spans             — broadcast of decoded side (distinct refs
                                      with stats; small), NO shuffle of spans
  3. final groupBy(polygon_id)      — partial agg map-side, tiny shuffle

The decode itself is shuffle-free and the big span table is never shuffled —
that is the property that survives a 100×/1000× scale-up: cost is one
pass over spans + one shuffle over distinct refs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cog3pio_spark.operators.assign import assign_cells
from cog3pio_spark.operators.decode import decode_tiles
from cog3pio_spark.operators.pip_join import pip_join


def media_spans(docs: DataFrame) -> DataFrame:
    """posexplode preserving span order: (doc_id, pos, kind, text, media_ref, offset)."""
    return docs.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id",
        "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def tiles_for_docs(docs: DataFrame, include_pixels: bool = False) -> DataFrame:
    """Decode every distinct media_ref once; return media spans joined to
    their decoded tile stats + cell assignments."""
    spans = media_spans(docs).filter(F.col("kind") == "media")
    refs = spans.select("media_ref").dropDuplicates(["media_ref"])
    decoded = decode_tiles(refs, include_pixels=include_pixels)
    tiles = assign_cells(decoded.filter(F.col("status") == "ok"))
    # broadcast the decoded side: distinct refs ≪ spans (Zipf dedupe)
    return spans.join(F.broadcast(tiles), "media_ref", "inner")


def flagship_pipeline(docs: DataFrame, polygons: DataFrame) -> DataFrame:
    """Docs → per-polygon tile/doc counts, the end-to-end spine (SURVEY M1)."""
    span_tiles = tiles_for_docs(docs)
    joined = pip_join(span_tiles, polygons)
    return (
        joined.groupBy("polygon_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.approx_count_distinct("doc_id").alias("n_docs"),
            F.countDistinct("media_ref").alias("n_tiles"),
            F.sum("mean").alias("sum_tile_mean"),
        )
        .orderBy("polygon_id")
    )
