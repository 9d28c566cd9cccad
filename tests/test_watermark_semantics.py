"""Watermark late-data semantics: events older than the watermark are
dropped from windowed aggregation, closed windows emit exactly once.

Spark 3.4+ subtlety pinned here: the LATE-EVENT filter uses the watermark
from the PREVIOUS micro-batch, while state EVICTION uses the current one —
so a late event is guaranteed dropped only one batch after the event time
that out-dated it was observed. At 100 TB this one-batch lag is invisible
(batches are seconds apart); in a 3-file test it's the difference between
n=2 and n=3, so the test feeds the late row two batches after the
watermark-advancing row.
"""

from __future__ import annotations

import datetime
import time

from pyspark.sql import functions as F

SCHEMA = "event_id: long, ts: timestamp, user_id: long, value: double"


def _t(h: int, m: int):
    return datetime.datetime(2024, 1, 1, h, m)


class TestLateData:
    def test_late_event_dropped_window_emits_once(self, spark, tmp_path):
        src = str(tmp_path / "events")
        batches = [
            # watermark source: 11:00 -> watermark 10:50 after this batch
            [(1, _t(10, 0), 1, 1.0), (2, _t(10, 1), 1, 1.0), (3, _t(11, 0), 1, 1.0)],
            # spacer batch (lets the late filter catch up to 10:50)
            [(4, _t(11, 30), 1, 1.0)],
            # 10:02 is now late beyond the watermark -> must be dropped
            [(5, _t(10, 2), 1, 1.0), (6, _t(12, 0), 1, 1.0)],
        ]
        for rows in batches:
            spark.createDataFrame(rows, SCHEMA).coalesce(1) \
                .write.mode("append").parquet(src)
            time.sleep(1.1)  # distinct mtimes -> stable file->batch order

        stream = (
            spark.readStream.schema(SCHEMA.replace(":", ""))
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count("*").alias("n"))
        )
        q = (
            agg.writeStream.format("memory").queryName("late_sem")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        rows = spark.table("late_sem").collect()
        got = {r["w"]["start"]: r["n"] for r in rows}
        # late 10:02 dropped: the 10:00 window holds 2, not 3
        assert got[_t(10, 0)] == 2
        assert got[_t(11, 0)] == 1
        assert got[_t(11, 30)] == 1
        # 12:00's window never closed (watermark never passed 12:05) -> absent
        assert _t(12, 0) not in got
        # exactly-once emission: no window appears twice in the append sink
        assert len(rows) == len(got)
