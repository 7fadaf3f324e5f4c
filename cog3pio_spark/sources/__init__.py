"""Table sources/sinks (SURVEY §2.B scans/sinks)."""

from cog3pio_spark.sources.doc_table import (  # noqa: F401
    read_doc_table,
    write_doc_table,
)
