"""Interleaved text+media documents generator (BASELINE.json input_hint).

Schema: ``doc_id STRING, spans ARRAY<STRUCT<kind, text, media_ref, offset>>``.

Generated *entirely with column expressions over spark.range* — no driver-side
loop, no Python row generation — so the same code path scales from 500 docs
(unit tests) to the 10^12-document design point by changing one integer:
``spark.range(n)`` is already partitioned, and every span expression is
whole-stage-codegen JVM work.

media_ref skew is Zipfian (s≈1.2) over the fixture registry so skew-handling
(salting, AQE skew split) fires for real (FIXTURES.md §1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ZIPF_S = 1.2


def zipf_cdf(n: int, s: float = ZIPF_S) -> list[float]:
    """Cumulative Zipf(s) distribution over ranks 0..n-1."""
    w = [1.0 / (r + 1) ** s for r in range(n)]
    tot = sum(w)
    acc, out = 0.0, []
    for x in w:
        acc += x / tot
        out.append(acc)
    return out


def interleaved_docs(
    spark: SparkSession,
    n_docs: int,
    media_refs: list[str],
    seed: int = 42,
    max_spans: int = 8,
    media_fraction: float = 0.4,
    partitions: int | None = None,
) -> DataFrame:
    """Build the interleaved documents DataFrame.

    Deterministic in (n_docs, media_refs, seed): span counts, kinds, texts and
    Zipfian media picks all derive from xxhash64 of (doc index, span index,
    seed) — never from rand()/clock, so checkpoint-resume re-runs and golden
    re-generation are exact (SURVEY §7 hard-part 5).
    """
    cdf = zipf_cdf(len(media_refs))
    refs_arr = F.array(*[F.lit(r) for r in media_refs])
    cdf_arr = F.array(*[F.lit(c) for c in cdf])

    df = spark.range(n_docs, numPartitions=partitions)
    h = lambda *cols: F.xxhash64(*cols, F.lit(seed))  # noqa: E731
    u01 = lambda *cols: (F.pmod(h(*cols), F.lit(1_000_000)) / 1_000_000.0)  # noqa: E731

    n_spans = (F.pmod(h(F.col("id")), F.lit(max_spans)) + 1).cast("int")

    def span(i):
        is_media = u01(F.col("id"), F.lit("kind"), i) < media_fraction
        # Zipf pick: count cdf entries below u → rank index
        u = u01(F.col("id"), F.lit("ref"), i)
        idx = F.size(F.filter(cdf_arr, lambda c: c < u))
        ref = F.element_at(refs_arr, idx + 1)
        txt = F.concat(
            F.lit("text-"),
            F.conv(F.abs(h(F.col("id"), F.lit("txt"), i)).cast("string"), 10, 16),
        )
        return F.struct(
            F.when(is_media, F.lit("media")).otherwise(F.lit("text")).alias("kind"),
            F.when(is_media, F.lit("")).otherwise(txt).alias("text"),
            F.when(is_media, ref).otherwise(F.lit(None).cast("string")).alias(
                "media_ref"
            ),
            i.cast("int").alias("offset"),
        )

    return df.select(
        F.format_string("doc%012d", F.col("id")).alias("doc_id"),
        F.transform(F.sequence(F.lit(0), n_spans - 1), span).alias("spans"),
    )


def interleave_from_documents(
    docs: DataFrame, media_refs: list[str], seed: int = 42, media_fraction: float = 0.4
) -> DataFrame:
    """Derive the interleaved (doc_id, spans) table from the driver's flat
    ``documents`` parquet (doc_id, text, ...) — deterministic column math.

    Text spans chunk the source text; media spans are interleaved after each
    chunk with Zipfian fixture refs keyed on xxhash64(doc_id, span index).
    Used by ``__spark_entry__.entry`` so the flagship query runs off the
    driver-provided table as required.
    """
    cdf = zipf_cdf(len(media_refs))
    refs_arr = F.array(*[F.lit(r) for r in media_refs])
    cdf_arr = F.array(*[F.lit(c) for c in cdf])
    h = lambda *cols: F.xxhash64(*cols, F.lit(seed))  # noqa: E731
    u01 = lambda *cols: (F.pmod(h(*cols), F.lit(1_000_000)) / 1_000_000.0)  # noqa: E731

    chunk = 40
    n_chunks = F.least(
        (F.length("text") / chunk).cast("int") + 1, F.lit(4)
    )

    def span(i):
        is_media = (u01(F.col("doc_id"), F.lit("k"), i) < media_fraction) & (i > 0)
        u = u01(F.col("doc_id"), F.lit("r"), i)
        idx = F.size(F.filter(cdf_arr, lambda c: c < u))
        ref = F.element_at(refs_arr, idx + 1)
        # text index = span index minus preceding MEDIA spans, so media
        # spans interleave BETWEEN chunks instead of replacing them (r4
        # review: substring(i*chunk) silently dropped the text chunk at
        # every media position — ~media_fraction of each doc's text never
        # appeared in any span). i=0 is always text, so the sequence guard
        # never sees an empty range.
        n_media_before = F.when(
            i > 0,
            F.size(
                F.filter(
                    F.sequence(F.lit(0), i - 1),
                    lambda j: (u01(F.col("doc_id"), F.lit("k"), j) < media_fraction)
                    & (j > F.lit(0)),
                )
            ),
        ).otherwise(F.lit(0))
        txt = F.substring(F.col("text"), F.lit(1) + (i - n_media_before) * chunk, chunk)
        return F.struct(
            F.when(is_media, F.lit("media")).otherwise(F.lit("text")).alias("kind"),
            F.when(is_media, F.lit("")).otherwise(txt).alias("text"),
            F.when(is_media, ref).otherwise(F.lit(None).cast("string")).alias("media_ref"),
            i.cast("int").alias("offset"),
        )

    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.transform(F.sequence(F.lit(0), n_chunks * 2 - 1), span).alias("spans"),
    )


def span_sequence_checksum(df: DataFrame) -> DataFrame:
    """Per-doc invariant hash of the ordered span sequence
    (kind, text, media_ref, offset) — the input_hint per-row invariant.

    Applied before and after a pipeline; equality proves span-sequence
    preservation. Pure column expressions (sha2 over to_json of the ordered
    array) — no shuffle beyond what the caller already has.
    """
    return df.select(
        "doc_id",
        F.sha2(
            F.to_json(
                F.transform(
                    "spans",
                    lambda s: F.struct(
                        s["kind"].alias("kind"),
                        s["text"].alias("text"),
                        s["media_ref"].alias("media_ref"),
                        s["offset"].alias("offset"),
                    ),
                )
            ),
            256,
        ).alias("span_checksum"),
    )
