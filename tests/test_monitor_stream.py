"""Streaming sequential monitor == batch monitor over the same events
(bit-identical: the state is six exact-integer sum-mergeable cells per
hour), including hours that span micro-batches; replaying a micro-batch
(foreachBatch's at-least-once window) must not double count.
"""

from __future__ import annotations

import datetime

from swiftbulkuploader_spark.operators.stats_inference import (
    monitor_hourly_cells,
    monitor_readout,
)
from swiftbulkuploader_spark.streaming.monitor_stream import (
    _write_delta,
    read_monitor,
    stream_experiment_monitor,
)

SCHEMA = ("event_id: long, ts: timestamp, user_id: long, "
          "event_type: string, value: double")


def _ts(day: int, hour: int, minute: int = 0):
    return datetime.datetime(2024, 1, day, hour, minute)


# users 1..6 split across the md5-parity arms; hour (1, 10) spans both
# micro-batches; values vary so the variance terms are live
BATCH1 = [
    (1, _ts(1, 10, 0), 1, "view", 10.0),
    (2, _ts(1, 10, 30), 2, "view", 25.5),
    (3, _ts(1, 11, 0), 3, "click", 40.25),
    (4, _ts(1, 11, 30), 4, "view", 7.75),
]
BATCH2 = [
    (5, _ts(1, 10, 45), 5, "view", 80.0),
    (6, _ts(1, 12, 0), 6, "purchase", 120.5),
    (7, _ts(1, 12, 30), 1, "view", 3.25),
]


def _readout_rows(df):
    return sorted(
        (
            (r["hour"], r["n_a"], r["n_b"], r["z"], r["boundary"], r["crossed"])
            for r in df.collect()
        ),
        key=lambda t: t[0],
    )


class TestStreamingMonitor:
    def test_streamed_monitor_equals_batch(self, spark, tmp_path):
        src = str(tmp_path / "events")
        # sequential writes: the file source orders by MODIFICATION time
        # (CLAUDE.md round-5 lesson)
        spark.createDataFrame(BATCH1, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        spark.createDataFrame(BATCH2, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

        delta = str(tmp_path / "monitor_delta")
        stream = (
            spark.readStream.schema(SCHEMA.replace(":", ""))
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_experiment_monitor(stream, delta, str(tmp_path / "cp"))
        assert q.awaitTermination(120)

        batch_df = monitor_readout(
            monitor_hourly_cells(spark.createDataFrame(BATCH1 + BATCH2, SCHEMA))
        )
        got = _readout_rows(read_monitor(spark, delta))
        expected = _readout_rows(batch_df)
        assert got == expected          # bit-identical: exact-integer cells
        assert len(got) == 3            # hours 10, 11, 12
        # the cross-batch hour saw rows from both micro-batches
        assert got[0][1] + got[0][2] == 3

    def test_batch_replay_does_not_double_count(self, spark, tmp_path):
        delta = str(tmp_path / "delta")
        fn = _write_delta(delta)
        b1 = spark.createDataFrame(BATCH1, SCHEMA)
        fn(b1, 0)
        once = _readout_rows(read_monitor(spark, delta))
        fn(b1, 0)  # at-least-once replay of the SAME batch id
        assert _readout_rows(read_monitor(spark, delta)) == once
        fn(spark.createDataFrame(BATCH2, SCHEMA), 1)
        final = _readout_rows(read_monitor(spark, delta))
        assert final == _readout_rows(
            monitor_readout(
                monitor_hourly_cells(
                    spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
                )
            )
        )

    def test_delta_partition_is_batch_proportional(self, spark, tmp_path):
        """The 100 TB claim made concrete: batch 2's delta partition
        contains ONLY hours batch 2 touched (its rollup never rescans
        history), and the cross-batch hour appears in both partitions as
        two mergeable deltas."""
        delta = str(tmp_path / "delta")
        fn = _write_delta(delta)
        fn(spark.createDataFrame(BATCH1, SCHEMA), 0)
        fn(spark.createDataFrame(BATCH2, SCHEMA), 1)
        per_batch = {
            b: {str(r["hour"]) for r in
                spark.read.parquet(delta)
                .filter(f"batch_id = {b}").collect()}
            for b in (0, 1)
        }
        assert per_batch[0] == {str(_ts(1, 10)), str(_ts(1, 11))}
        assert per_batch[1] == {str(_ts(1, 10)), str(_ts(1, 12))}
