"""Dataset catalog: load the driver parquet tables and register views.

The reference's only catalog is a dynamically-named MySQL table created
imperatively at runtime (olrcdb.py:36-52); here every dataset is a Parquet
directory loaded with an explicit reader and registered as a temp view so
both the DataFrame API and ``spark.sql`` can reach it.

Scans stay fully declarative: filters and column pruning reach the parquet
reader via Catalyst (verify with ``df.explain`` — ``PushedFilters`` /
``ReadSchema``), which is the 100 TB-scale replacement for the reference's
DB-side ``WHERE uploaded=0`` (bulkupload.py:357).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver-generated tables (TESTDATA.md).
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_session_defaults(spark: SparkSession) -> None:
    """Session invariants the engine's semantics rely on, applied defensively
    (the driver harness may hand us a session it built itself):

    * UTC session time zone — FIXTURES.md declares timestamps UTC, and it
      keeps instant<->wall-clock conversions the identity;
    * nanosAsLong — events.ts is parquet TIMESTAMP(NANOS), which Spark has
      no native type for; read as long and convert (see load_table).
    * hugeMethodLimit 8000 — perf-defensive, not semantic: generated
      methods past HotSpot's 8000-bytecode JIT limit execute as
      interpreted bytecode (~4.5x slower than Spark's interpreted path,
      silently); falling back to per-operator execution at the JVM's
      real boundary keeps the unrolled-expression queries (MMD kernel,
      JL projection) off that cliff in sessions the harness built
      itself (session.py sets the same for ours).
    """
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
    except Exception:  # pragma: no cover - conf may be frozen in odd harnesses
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_session_defaults(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long nanos; truncate to micros exactly
        # (integer `div`, no double round-trip) — matches DuckDB's ns->us.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR,
                register: bool = True) -> dict[str, DataFrame]:
    """Load every driver table; optionally register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
