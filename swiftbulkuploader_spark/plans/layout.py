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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def zorder_key(x: Column, y: Column, bits: int = 21) -> Column:
    """Z-order (Morton) key for two non-negative integer columns: interleave
    the low `bits` bits of each (21+21 = 42 bits, fits a long).

    Why: a lexicographic sort on (x, y) clusters only the prefix column —
    parquet min/max row-group stats then prune nothing for a y-only or box
    predicate. Bit interleaving makes every row group cover a small *square*
    of (x, y) space, so range predicates on EITHER dimension skip most row
    groups. This is the single biggest scan lever at 100 TB after partition
    pruning: data laid out once, every selective query reads ~sqrt of it.

    Pure Column bit-arithmetic (shiftleft/or chain) — whole-stage codegen,
    no UDF; constant-folded per row at write time only.
    """
    z = F.lit(0).cast("long")
    xb = x.cast("long")
    yb = y.cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def write_zordered(df: DataFrame, path: str, x: str, y: str,
                   n_files: int, mode: str = "overwrite") -> None:
    """Persist parquet clustered on the Z-order of (x, y): range-partition by
    the interleaved key (file-level locality) and sort within partitions
    (row-group-level locality). The `_z` helper column is dropped before the
    write — ordering survives projection."""
    (
        df.withColumn("_z", zorder_key(F.col(x), F.col(y)))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def minmax_prunable_fraction(path: str, bounds: dict[str, tuple]) -> float:
    """Fraction of parquet row groups a min/max-stats reader skips for a
    conjunctive box predicate {col: (lo, hi)} — the engine-independent
    measure of clustering quality (this is exactly the pruning parquet
    readers, Spark's included, do per row group at scan time)."""
    import pyarrow.parquet as pq

    ds = pq.ParquetDataset(path)
    total = skipped = 0
    for frag in ds.fragments:
        meta = frag.metadata
        names = frag.physical_schema.names
        for rg in range(meta.num_row_groups):
            total += 1
            row = meta.row_group(rg)
            for col, (lo, hi) in bounds.items():
                st = row.column(names.index(col)).statistics
                # has_min_max guard: stats can exist without min/max (all-null
                # chunks, truncated binary stats) — treat as unprunable
                if st is not None and st.has_min_max and (st.min > hi or st.max < lo):
                    skipped += 1
                    break
    return skipped / total if total else 0.0
