"""Flagship spatial-join + tile-assignment pipeline.

    docs → posexplode(spans) → filter(kind='media')
         → dropDuplicates(media_ref) → decode (mapInArrow)
         → join back on media_ref (broadcast: distinct refs ≪ spans)
         → assign cells (S2 + hex res 5..12)
         → broadcast PIP join vs polygon layer
         → groupBy(polygon_id) aggregation

Shuffle inventory (SURVEY §3.4 node boundaries):
  1. dropDuplicates(media_ref)      — shuffle on media_ref, input = refs only
                                      (one narrow column, not pixels)
  2. join decoded↔spans             — broadcast of decoded side (distinct refs
                                      with stats; small), NO shuffle of spans
  3. final groupBy(polygon_id)      — partial agg map-side, tiny shuffle

Scale-critical plan property: the PIP theta-join runs over *distinct tiles*
(O(distinct media_refs)), never over spans — containment depends only on the
tile geometry, so the verdict (media_ref → polygon_id) is computed once per
tile and equi-joined back to the fat span table JVM-side. The Python/Arrow
boundary therefore carries O(tiles) narrow rows, not O(spans) fat rows
(measured 2.2× end-to-end on the 400k-doc bench; the gap widens with doc
count since span volume scales and tile volume doesn't).

At 10^12 docs with ~10^7 distinct refs the tile side outgrows a broadcast;
the media_ref equi-join then degrades gracefully to a shuffled hash join on
an 8-byte-hashable key — still never a theta join on the big side.
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
    their decoded tile stats + cell assignments.

    EVERY media span keeps a row: refs that failed to decode come through
    with status='error' + error_msg and null cell columns (r4 review — the
    former status filter + inner join silently DROPPED all spans of a
    corrupt ref, so callers could not distinguish 'no media' from 'decode
    failed'; the fused kernel documents the never-lose-decode-results
    contract, and the modular path now honors it too). Filter
    status == 'ok' to recover the old shape explicitly."""
    spans = media_spans(docs).filter(F.col("kind") == "media")
    refs = spans.select("media_ref").dropDuplicates(["media_ref"])
    decoded = decode_tiles(refs, include_pixels=include_pixels)
    ok = assign_cells(decoded.filter(F.col("status") == "ok"))
    err = decoded.filter(F.col("status") != "ok")
    # error rows gain the assignment columns as nulls
    tiles = ok.unionByName(err, allowMissingColumns=True)
    # broadcast the decoded side: distinct refs ≪ spans (Zipf dedupe)
    joined = spans.join(F.broadcast(tiles), "media_ref", "left")
    # r5 review: a media span with NULL media_ref can't equi-join its error
    # row (decode emits it under media_ref '' per its non-null contract),
    # so it surfaced with status NULL — violating the status='error'
    # accounting contract above. Tag it explicitly with the decode
    # taxonomy's own message.
    # error_msg FIRST: the condition reads status, which the second
    # withColumn overwrites (a status-then-msg order left error_msg null)
    null_ref = F.col("media_ref").isNull() & F.col("status").isNull()
    return joined.withColumn(
        "error_msg",
        F.when(
            null_ref, F.lit("Cannot parse url: null or empty media_ref")
        ).otherwise(F.col("error_msg")),
    ).withColumn(
        "status", F.when(null_ref, F.lit("error")).otherwise(F.col("status"))
    )


def doc_media_refs(docs: DataFrame, prune_text: bool = False) -> DataFrame:
    """(doc_id, media_ref) — one row per media span. Two plan shapes, same
    output (pinned by test_plans.py::test_doc_media_refs_pruned_scan_equal):

    ``prune_text=False`` (default): posexplode + subfield projection.
    Catalyst's nested-schema pruning does NOT fire through posexplode — the
    text subfield IS read and decoded from parquet. Generate is codegen'd
    while HOF lambdas are interpreted (2.25s vs 9.6s on 72M spans for the
    filter/transform formulation — do not "fix" this with F.transform: it
    measured 7.6s AND still read text).

    ``prune_text=True``: GetArrayStructFields extraction (``spans.kind``,
    ``spans.media_ref`` — direct ExtractValue, no lambda) zipped with
    arrays_zip, then exploded. Pruning FIRES: ReadSchema drops text+offset
    (81% of the bench table's compressed bytes). Cost is one zipped array
    materialization per doc, so the winner depends on text bytes per span
    (measured, 32 cores, page-cached):

      * thin spans (bench table, ~12 compressed B/span): default 1.9s vs
        pruned 2.8s — per-span zip overhead beats the free cached IO;
      * fat spans (~450 B/span, 0.7 GB): default 0.99s vs pruned 0.45s.

    At 100 TB the data is NOT in page cache and real web spans are KBs, so
    prune_text=True is the cluster shape: it turns an 81%-of-bytes column
    into zero IO. The local default stays False only because the sandbox
    bench corpus has 40-char spans and fully cached files.
    """
    if prune_text:
        slim = docs.select(
            "doc_id",
            F.arrays_zip(
                F.col("spans.kind").alias("kind"),
                F.col("spans.media_ref").alias("media_ref"),
            ).alias("sp"),
        )
        return (
            slim.select("doc_id", F.explode("sp").alias("s"))
            .select(
                "doc_id",
                F.col("s.kind").alias("kind"),
                F.col("s.media_ref").alias("media_ref"),
            )
            .filter(F.col("kind") == "media")
            .drop("kind")
        )
    return (
        docs.select("doc_id", F.posexplode("spans").alias("pos", "span"))
        .select(
            "doc_id",
            F.col("span.kind").alias("kind"),
            F.col("span.media_ref").alias("media_ref"),
        )
        .filter(F.col("kind") == "media")
        .drop("kind")
    )


def flagship_enriched(
    docs: DataFrame, polygons: DataFrame, prune_text: bool = False
) -> DataFrame:
    """The flagship's enriched intermediate: one row per (media_ref,
    polygon) carrying decode stats + cell assignments + pre-aggregated span
    stats (ref_spans, doc_sketch). Exposed (r5) so jobs needing BOTH the
    per-polygon aggregate and the per-tile sink run the expensive
    decode+assign+PIP kernel ONCE (localCheckpoint and derive both) instead
    of once per consumer — run_flagship.py previously decoded every tile
    twice per submission."""
    from cog3pio_spark.operators.tile_kernel import fused_decode_assign_pip

    span_refs = doc_media_refs(docs, prune_text=prune_text)
    per_ref = span_refs.groupBy("media_ref").agg(
        F.count("*").alias("ref_spans"),
        F.hll_sketch_agg(F.xxhash64("doc_id"), F.lit(10)).alias("doc_sketch"),
    )
    par = docs.sparkSession.sparkContext.defaultParallelism
    return fused_decode_assign_pip(per_ref.repartition(par), polygons)


def flagship_aggregate(enriched: DataFrame) -> DataFrame:
    """Per-polygon rollup over `flagship_enriched` output (the flagship's
    tail; factored r5 for single-kernel-execution jobs)."""
    return (
        enriched.filter(F.col("polygon_id").isNotNull())
        .groupBy("polygon_id")
        .agg(
            F.sum("ref_spans").alias("n_spans"),
            F.hll_sketch_estimate(F.hll_union_agg("doc_sketch")).alias("n_docs"),
            F.count("*").alias("n_tiles"),  # exact: one row per (ref, polygon)
            F.sum(F.col("mean") * F.col("ref_spans")).alias("sum_tile_mean"),
        )
    )


def flagship_pipeline(
    docs: DataFrame, polygons: DataFrame, prune_text: bool = False
) -> DataFrame:
    """Docs → per-polygon tile/doc counts, the end-to-end spine (SURVEY M1).

    Plan shape (scale rationale in the module docstring):
      * span side: ONE pass over (doc_id, spans) — with ``prune_text=True``
        the parquet scan reads only the kind/media_ref subfields (the
        cluster shape; see doc_media_refs for the measured trade);
      * ref side: per-doc distinct refs (cheap array op) → global dedupe on
        one narrow column → repartition (AQE would coalesce the tiny ref set
        to 1 partition and serialize the decode — Amdahl) → fused
        decode+assign+PIP kernel: a single Python stage for the whole tile
        branch;
      * verdict broadcast back; final partial-agg shuffle is tiny.
    """
    # ONE pass + ONE shuffle over the span table inside flagship_enriched:
    # pre-aggregate per media_ref (count + HLL doc sketch). Map-side partial
    # agg collapses every task to ≤ |distinct refs| rows before the shuffle;
    # the polygon fan-out then happens on O(refs) rows instead of O(spans) —
    # at 40M docs this removed a ~290M-row join→agg (the span×polygon
    # blow-up) from the plan. Pre-aggregated stats ride THROUGH the fused
    # kernel (passthrough columns), so the verdict needs no downstream join
    # and per_ref has a single consumer — one scan, one shuffle, one Python
    # stage. (Earlier two-consumer designs either scanned the span table
    # twice — column pruning blocks exchange reuse — or needed a persist()
    # that Spark's plan-cache would leak across jobs.) sketch lgK=10 → ~1 KB
    # sketches (±3.3% doc-count error), 4× less shuffle than default.
    # no orderBy: global sort adds a range-sampling job per run; callers
    # that need canonical order (golden tests) sort the tiny result.
    return flagship_aggregate(flagship_enriched(docs, polygons, prune_text))
