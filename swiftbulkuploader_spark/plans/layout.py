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


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   sort_by: str | None = None, mode: str = "overwrite") -> None:
    """Persist a table bucketed (and optionally sorted) by its join key.

    The co-location contract: two tables bucketed on the same key with the
    same bucket count join WITHOUT a shuffle (SortMergeJoin reads bucket i
    against bucket i). At 100 TB this converts the fact-fact join
    (orders-lineitem, manifest-attempts) from the dominant network cost to
    a local merge — pay the shuffle once at ingest, never per query.
    Bucketing metadata lives in the session catalog (saveAsTable), which is
    what makes Catalyst trust the layout; a plain parquet write loses it.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)
