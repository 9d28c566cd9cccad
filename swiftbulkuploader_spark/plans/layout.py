"""Partition-layout helpers.

Spark sizes scan splits by *bytes* (`spark.sql.files.maxPartitionBytes`) and
cannot split below a parquet row group. For compute-dense derivations
(shingling, 32-way minhashing, per-bit simhash votes, exact percentiles) the
byte-sized split is far too coarse: a 10 MB single-row-group file becomes one
task no matter how many cores exist — locally *and* on a 1000-executor
cluster reading coarse files. `spread()` inserts an explicit round-robin
repartition so the expensive projection runs wide; the extra shuffle moves
only the raw input columns and is amortized by the downstream compute.

Rule of thumb encoded here: spread when (cost per row x rows per split) >>
(shuffle cost per row), i.e. CPU-bound derivations — never for plain
scan/filter/agg, where Catalyst's byte-based splits are already right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition to the session's default parallelism (or an
    explicit width) ahead of a compute-dense stage."""
    if parallelism is None:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(parallelism)
