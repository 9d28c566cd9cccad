"""Streaming maintenance of the crawl frontier: incremental URL admission.

The streaming twin of operators/urlops.py::x1_url_frontier — the way a
real crawler actually runs: newly discovered documents arrive in
micro-batches, each batch's NEW canonical URLs (never admitted before)
are appended to their registered domain's politeness queue at the next
free slots, and already-admitted URLs keep their slots FOREVER (re-slotting
a frozen queue would reshuffle a live crawl). This is arrival-order
politeness: within a batch, ties order by the batch query's own
deterministic (keeper_doc, canonical_url) key; across batches, by arrival
— so the streamed frontier is NOT the batch frontier re-sorted, and the
pins assert the incremental invariants instead (the x1_incremental_clusters
discipline): per-domain slots stay contiguous and duplicate-free, frozen
rows are byte-identical after new batches, and a re-crawled URL is not
re-admitted.

Replay safety (foreachBatch is at-least-once): batch N derives its
admission set and slot bases ONLY from partitions with batch_id < N and
writes its own batch_id partition via dynamic partition overwrite — a
replay recomputes the identical rows from the identical frozen prefix and
overwrites them in place (the rollup_stream discipline, extended to
state that READS the frozen prefix).

At 100 TB: per-batch work = canonicalize the batch + one anti-join and
one per-domain max against the admitted table (both hash joins on
bounded-width keys); nothing rescans the corpus. Reference parity: the
reference's resume skips already-uploaded files before queueing
(bulkupload.py readme resume semantics); this is that anti-join promoted
to canonical-URL identity with politeness slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swiftbulkuploader_spark.functions.urls import (
    canonical_host,
    canonicalize_url,
    with_registered_domain,
)
from swiftbulkuploader_spark.operators.urlops import (
    FRONTIER_DELAY_MS,
    _messy_url,
)
from swiftbulkuploader_spark.streaming.state_io import read_state_or_none

_OUT_COLS = (
    "canonical_url", "registered_domain", "keeper_doc",
    "slot", "sched_offset_ms",
)


def _batch_keepers(batch: DataFrame) -> DataFrame:
    """documents rows -> deduped canonical keepers with registered
    domain (the x1_url_frontier front half, applied to one batch)."""
    urls = batch.select("doc_id", _messy_url().alias("url"))
    canon = urls.select(
        "doc_id",
        canonicalize_url(F.col("url")).alias("canonical_url"),
        canonical_host(F.col("url")).alias("host"),
    )
    w = Window.partitionBy("canonical_url")
    return (
        with_registered_domain(canon, "host")
        .select(
            "doc_id", "canonical_url", "registered_domain",
            F.min("doc_id").over(w).alias("keeper_doc"),
        )
        .filter(F.col("doc_id") == F.col("keeper_doc"))
        .drop("doc_id")
    )


def _admit_batch(delta_path: str):
    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        keepers = _batch_keepers(batch)
        # None ONLY when the state genuinely doesn't exist yet (first
        # batch); any other read failure raises and fails the batch so
        # the checkpoint replays it against intact state — a swallowed
        # IO error here would re-admit the whole batch from slot 0 and
        # permanently corrupt the contiguity/never-re-admit invariants
        frozen = read_state_or_none(spark, delta_path)
        if frozen is not None:
            # replay safety: ONLY the strictly-earlier prefix — a
            # replayed batch must not read its own crashed attempt
            frozen = frozen.filter(F.col("batch_id") < batch_id)
        if frozen is not None:
            keepers = keepers.join(
                frozen.select("canonical_url"), "canonical_url", "left_anti"
            )
            base = frozen.groupBy("registered_domain").agg(
                (F.max("slot") + 1).alias("base")
            )
        else:
            base = None
        wd = Window.partitionBy("registered_domain").orderBy(
            "keeper_doc", "canonical_url"
        )
        admitted = keepers.withColumn("rn", F.row_number().over(wd) - 1)
        if base is not None:
            admitted = admitted.join(base, "registered_domain", "left")
            slot = F.coalesce(F.col("base"), F.lit(0)) + F.col("rn")
        else:
            slot = F.col("rn")
        out = admitted.select(
            "canonical_url", "registered_domain", "keeper_doc",
            slot.cast("long").alias("slot"),
            (slot * F.lit(FRONTIER_DELAY_MS)).cast("long")
            .alias("sched_offset_ms"),
            F.lit(batch_id).alias("batch_id"),
        )
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            out.write.partitionBy("batch_id").mode("overwrite").parquet(
                delta_path
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return fn


def read_frontier(spark: SparkSession, delta_path: str) -> DataFrame:
    """Current admitted frontier (all batches' slots; disjoint URL sets
    by construction of the admission anti-join)."""
    return spark.read.parquet(delta_path).select(*_OUT_COLS)


def stream_frontier_admission(docs_stream: DataFrame, delta_path: str,
                              checkpoint: str):
    """Start incremental admission: documents stream -> per-batch
    admitted-slot partitions at `delta_path` (read with read_frontier).
    Returns the StreamingQuery."""
    return (
        docs_stream.writeStream.foreachBatch(_admit_batch(delta_path))
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
