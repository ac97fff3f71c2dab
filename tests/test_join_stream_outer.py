"""Batch/stream parity for the watermark-evicted LEFT OUTER
attribution join (streaming/join_stream.view_purchase_outer_*).

The outer join's NULL rows ("view with no purchase within 1 h") only
emit once the purchase-side watermark proves no qualifying purchase
can still arrive, so the harness APPENDS FUTURE SENTINEL events and
re-triggers: Spark commits the advanced watermark at the end of the
batch that READS the sentinel and applies it (evicting state and
emitting the nulls) at the NEXT batch — hence two sentinel files and
three availableNow runs against one checkpoint.  Real production
streams advance the watermark continuously, so nulls trail the event
time by at most the watermark delay + trigger interval; the sentinel
dance is purely a test-harness determinism device.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from f1_data_engineering_spark.sources.registry import TEST_TABLES, load_table
from f1_data_engineering_spark.streaming.events import events_file_stream
from f1_data_engineering_spark.streaming.join_stream import (
    view_purchase_outer_pairs,
    view_purchase_outer_stream,
)

SF = "/root/testdata/sf0.001"
SENTINEL_USER = -999


def _rows(df) -> set:
    return {
        (r["user_id"], r["view_id"], r["purchase_id"], r["lag_seconds"])
        for r in df.collect()
    }


def test_outer_stream_join_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    events_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")
    # split by TIME, not id parity: an outer join's null emissions are
    # irreversible, so files must arrive roughly in event-time order —
    # data later than the watermark delay behind the max seen ts is
    # legitimately treated as too-late (the inner-join test tolerates
    # the id-parity shuffle only because dropped-then-rejoined state
    # can't fabricate rows there)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    ev.filter(F.col("ts") <= F.lit(mid)).coalesce(1).write.mode(
        "append"
    ).parquet(events_dir)
    ev.filter(F.col("ts") > F.lit(mid)).coalesce(1).write.mode(
        "append"
    ).parquet(events_dir)

    batch = _rows(view_purchase_outer_pairs(ev))
    matched = {r for r in batch if r[2] is not None}
    nulls = {r for r in batch if r[2] is None}
    assert matched and nulls, "fixture must exercise both outer legs"

    out_dir = str(tmp_path / "out")

    def run_available_now() -> None:
        # parquet sink, not memory: the harness restarts the query per
        # sentinel advance, and only file sinks recover from a checkpoint
        out = view_purchase_outer_stream(events_file_stream(spark, events_dir))
        assert out.isStreaming
        q = (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def write_sentinels(offset_hours: int) -> None:
        base = ev.agg(F.max("ts")).first()[0] + dt.timedelta(hours=offset_hours)
        rows = [
            (10_000_000 + offset_hours, base, SENTINEL_USER, "view", 0.0, None),
            (
                10_000_001 + offset_hours,
                base + dt.timedelta(hours=2),
                SENTINEL_USER - 1,
                "purchase",
                0.0,
                None,
            ),
        ]
        spark.createDataFrame(rows, TEST_TABLES["events"]).coalesce(1).write.mode(
            "append"
        ).parquet(events_dir)

    # run 1: real data — matches append as they join; any null rows
    # already emitted (first-file views whose window closed before the
    # second file's batch) must be FINAL, i.e. batch-correct
    run_available_now()
    got = _rows(spark.read.parquet(out_dir))
    assert matched <= got and got <= batch

    # runs 2-3: sentinel advance + apply (watermark commits at the end
    # of the batch that reads it, evicts at the next)
    write_sentinels(6)
    run_available_now()
    write_sentinels(12)
    run_available_now()

    got = {
        r
        for r in _rows(spark.read.parquet(out_dir))
        if r[0] not in (SENTINEL_USER, SENTINEL_USER - 1)
    }
    assert got == batch
