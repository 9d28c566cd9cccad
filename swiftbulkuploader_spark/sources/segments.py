"""Segment planner + ranged-read executor (SURVEY.md §2.1 S11, §3.3).

The reference's `split_file` reads a file in text mode and writes chunk
files single-threaded (filesegmenter.py:4-42) — and is never invoked by the
upload path even though SEGMENT_SIZE exists (bulkupload.py:12). Here
segmentation is what it was evidently *for*: files larger than the segment
size become multi-part uploads.

Byte semantics throughout (the reference's text-mode read counts characters
and crashes on binary files — a defect, SURVEY.md §7.4 item 3).

Two layers:
* `segment_plan`   — pure DataFrame math: one row per (file, segment) via
                     `explode(sequence(...))`. No data moved.
* `read_segments`  — mapInPandas ranged reads: each task opens its files,
                     seeks, reads only its segments' byte ranges. A 10 GB
                     file becomes 100 x 100 MB independent tasks.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from swiftbulkuploader_spark.functions.paths import path_basename, segment_name

DEFAULT_SEGMENT_SIZE = 100 * 10**6  # the reference's unused constant, bulkupload.py:12

SEGMENT_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("seg_no", T.IntegerType()),
    T.StructField("seg_offset", T.LongType()),
    T.StructField("seg_length", T.LongType()),
    T.StructField("seg_name", T.StringType()),
])


def segment_plan(manifest: DataFrame, size: int = DEFAULT_SEGMENT_SIZE) -> DataFrame:
    """(path, seg_no, seg_offset, seg_length, seg_name) per segment.

    Invariants (FIXTURES.md): sum(seg_length) == size per file, lengths in
    (0, size], contiguous non-overlapping offsets. Zero-byte files get one
    empty segment (the reference writes no chunk for them — we keep the row
    so every manifest entry appears in the plan).
    """
    n_segs = F.floor((F.greatest(F.col("size"), F.lit(1)) - 1) / size) + 1
    plan = manifest.select(
        "path",
        "size",
        F.explode(F.sequence(F.lit(0), (n_segs - 1).cast("int"))).alias("seg_no"),
    )
    offset = F.col("seg_no").cast("long") * size
    length = F.least(F.lit(size).cast("long"), F.col("size") - offset)
    return plan.select(
        "path",
        "seg_no",
        offset.alias("seg_offset"),
        F.greatest(length, F.lit(0)).alias("seg_length"),
        segment_name(path_basename(F.col("path")), F.col("seg_no")).alias("seg_name"),
    )


CONTENT_SCHEMA = T.StructType(
    SEGMENT_SCHEMA.fields + [T.StructField("content", T.BinaryType())]
)


def read_segments(plan: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Execute ranged reads for a segment plan. Repartitioned so one huge
    file's segments spread across tasks instead of serializing in one."""
    if parallelism:
        plan = plan.repartition(parallelism)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = []
            for row in pdf.itertuples(index=False):
                with open(row.path, "rb") as fh:
                    fh.seek(row.seg_offset)
                    contents.append(fh.read(row.seg_length))
            out = pdf.copy()
            out["content"] = contents
            yield out

    return plan.mapInPandas(fn, CONTENT_SCHEMA)
