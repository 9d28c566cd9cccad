"""Streaming dedup: exact-dup suppression on a document stream
(`dropDuplicatesWithinWatermark` on the content fingerprint).

The batch dedup operators (operators/dedup.py) assume the corpus is at
rest; ingestion pipelines see documents ARRIVE, and re-crawls emit the same
content hours apart. Keyed on the md5 fingerprint with a watermark-bounded
state window: a duplicate arriving within the watermark of its first copy is
dropped; state for fingerprints older than the watermark is evicted, so
state size tracks the watermark window, not corpus history — the property
that lets this run forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swiftbulkuploader_spark.functions.text import fingerprint


def stream_dedup_exact(docs_stream: DataFrame, ts_col: str = "ts",
                       watermark: str = "1 hour") -> DataFrame:
    """doc stream (doc_id, text, ts) -> exactly ONE copy per fingerprint
    within the watermark window.

    Which copy survives is arbitrary within a micro-batch (no event-time
    ordering guarantee — use the batch keep-best policy when survivor choice
    matters); duplicates separated by more than the watermark are both kept
    (by design — state must be evictable; pair with a periodic batch dedup
    for full-history guarantees)."""
    return (
        docs_stream.withColumn("fp", fingerprint(F.col("text")))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
