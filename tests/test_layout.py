"""Data-layout scale levers: Z-order clustering (measured row-group pruning)
and runtime bloom-filter join pruning (plan-level).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swiftbulkuploader_spark.plans.layout import (
    minmax_prunable_fraction,
    write_zordered,
    zorder_key,
)

N = 40_000
SIDE = 256  # x, y uniform in [0, SIDE)


def _grid(spark):
    # deterministic pseudo-random points: hash-mix the id, no RNG state
    return (
        spark.range(N)
        .select(
            (F.xxhash64("id") % SIDE).alias("x"),
            (F.xxhash64("id", F.lit(1)) % SIDE).alias("y"),
            F.col("id").alias("payload"),
        )
        .select(F.abs("x").alias("x"), F.abs("y").alias("y"), "payload")
    )


class TestZOrder:
    def test_zorder_key_interleaves(self, spark):
        rows = spark.range(1).select(
            zorder_key(F.lit(0b11), F.lit(0b00)).alias("z_x"),
            zorder_key(F.lit(0b00), F.lit(0b11)).alias("z_y"),
            zorder_key(F.lit(0b11), F.lit(0b11)).alias("z_xy"),
        ).first()
        assert rows["z_x"] == 0b0101
        assert rows["z_y"] == 0b1010
        assert rows["z_xy"] == 0b1111

    def test_zorder_prunes_what_linear_sort_cannot(self, spark, tmp_path):
        df = _grid(spark)
        lin, zo = str(tmp_path / "linear"), str(tmp_path / "zorder")
        # linear: sorted by (x, y) — y is unclustered inside every file
        (
            df.repartitionByRange(16, "x", "y")
            .sortWithinPartitions("x", "y")
            .write.parquet(lin)
        )
        write_zordered(df, zo, "x", "y", n_files=16)

        # box query selective in y only: the adversarial case for the linear
        # layout (prefix column useless), the win case for Z-order
        box = {"y": (0, SIDE // 16 - 1)}
        lin_skip = minmax_prunable_fraction(lin, box)
        zo_skip = minmax_prunable_fraction(zo, box)
        assert zo_skip > lin_skip
        assert zo_skip >= 0.5  # most row groups never read
        # and both dims together prune at least as hard
        both = {"x": (0, SIDE // 16 - 1), "y": (0, SIDE // 16 - 1)}
        assert minmax_prunable_fraction(zo, both) >= zo_skip

    def test_zorder_key_is_bijective(self, spark):
        # interleaving must never collide: distinct (x, y) -> distinct z
        df = _grid(spark)
        n = df.select("x", "y").distinct().count()
        nz = (
            df.select(zorder_key(F.col("x"), F.col("y")).alias("z"))
            .distinct().count()
        )
        assert n == nz

    def test_zordered_data_roundtrips(self, spark, tmp_path):
        df = _grid(spark)
        path = str(tmp_path / "z")
        write_zordered(df, path, "x", "y", n_files=8)
        back = spark.read.parquet(path)
        assert back.count() == N
        assert back.agg(F.sum("payload")).first()[0] == df.agg(F.sum("payload")).first()[0]
        assert set(back.columns) == {"x", "y", "payload"}  # _z dropped


class TestRuntimeBloomFilter:
    def test_bloom_filter_injected_into_probe_side(self, spark, tmp_path):
        """A selective dimension filter should inject a runtime bloom filter
        into the fact-side scan (row-level runtime filtering): at 100 TB this
        drops most of the shuffle before it happens. Thresholds are lowered to
        local-test sizes; the optimization itself is stock Spark."""
        fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
        spark.range(200_000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
        ).write.parquet(fact_p)
        spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("tag")
        ).write.parquet(dim_p)

        confs = {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        }
        old = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            fact = spark.read.parquet(fact_p)
            dim = spark.read.parquet(dim_p).filter(F.col("tag") == 3)
            joined = fact.join(dim, "k")
            plan = joined._jdf.queryExecution().optimizedPlan().toString()
            assert "might_contain" in plan, plan[:2000]
            # correctness unchanged by the runtime filter
            expected = 200_000 // 1000 * (1000 // 7 + 1)
            assert joined.count() == expected
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
