"""Batch/stream parity for the stream-stream attribution join."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_engineering_spark.sources.registry import load_table
from f1_data_engineering_spark.streaming.events import events_file_stream
from f1_data_engineering_spark.streaming.join_stream import (
    view_purchase_pairs,
    view_purchase_pairs_stream,
)

SF = "/root/testdata/sf0.001"


def _pairs(df) -> set:
    return {
        (r["user_id"], r["purchase_id"], r["view_id"], r["lag_seconds"])
        for r in df.collect()
    }


def test_stream_stream_join_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    events_dir = str(tmp_path / "ev")
    # two files → two micro-batch-visible chunks under availableNow
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(events_dir)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(events_dir)

    batch = _pairs(view_purchase_pairs(ev))
    assert batch, "no view→purchase pairs in the fixture window"

    stream = events_file_stream(spark, events_dir)
    out = view_purchase_pairs_stream(stream)
    assert out.isStreaming
    # append mode: a stream-stream inner join has no aggregate state to
    # re-emit — each joined pair appends exactly once
    q = (
        out.writeStream.format("memory")
        .queryName("t_vp_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _pairs(spark.table("t_vp_join"))
    # file-source streams re-deliver whole files; the inner join output
    # in append mode must equal the batch join exactly
    assert got == batch
