"""Frozen-state reads for foreachBatch sinks that maintain their own
parquet state (frontier slots, attempt logs, cluster labels).

The round-10 ADVICE defect class this module closes: a bare
``except Exception`` around the state read — intended only for the
"first batch, no state yet" case — also swallows transient IO errors,
corrupted footers, and permission failures, silently treating REAL
state as empty. For the frontier that meant re-admitting every URL
from slot 0 and permanently corrupting the contiguity / never-re-admit
invariants; for the attempt log it meant re-uploading done files.

``read_state_or_none`` distinguishes the two cases explicitly: it
checks path existence through the Hadoop FileSystem of the path itself
(works for local dirs in tests and object stores in production — the
same resolution ``spark.read`` uses), returns ``None`` only when the
state genuinely does not exist yet, and lets EVERY other failure
propagate so the foreachBatch attempt fails and the checkpoint replays
the batch against intact state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def state_path_exists(spark: SparkSession, path: str) -> bool:
    """True iff `path` exists on its own filesystem (local, HDFS, or an
    object store — resolved exactly like spark.read would). Failures of
    the existence CHECK itself propagate: an unreachable filesystem is
    not "no state"."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    return bool(fs.exists(jpath))


def read_state_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """spark.read.parquet(path), or None ONLY if the path does not
    exist yet (the legitimate first-batch case). Any other read failure
    (IO error, corrupt footer, permissions) raises, failing the batch
    so the streaming checkpoint replays it — state is never silently
    treated as empty."""
    if not state_path_exists(spark, path):
        return None
    return spark.read.parquet(path)
