"""Structured Streaming ingest (SURVEY §2.B streaming — optional stretch).

The north_rule's resumability requirement is met by the *batch* partition
manifest (operators/checkpoint.py). This module adds the streaming variant:
a ``Trigger.AvailableNow`` file-source ingest over the interleaved-doc table
with watermarked tumbling-window counts, for deployments that land docs
continuously. Semantics (span explode → media filter → window agg) reuse the
same column logic as the batch plan.
"""

from cog3pio_spark.streaming.ingest import (  # noqa: F401
    available_now_ingest,
    windowed_media_counts,
)
