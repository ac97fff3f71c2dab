"""Batch/stream parity for the streaming HyperLogLog legs.

The invariants under test:
* streaming registers (complete-mode aggregation) == batch registers,
* the foreachBatch-landed register table == batch registers, and
* replaying the stream into an existing table changes nothing
  (register-wise MAX idempotence — the recovery guarantee).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_spark.sources.registry import load_table
from f1_data_engineering_spark.streaming.events import (
    events_file_stream,
    write_stream_to_memory,
)
from f1_data_engineering_spark.streaming.hll_stream import (
    hll_register_stream,
    hll_registers,
    write_stream_hll_ingest,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hll_events_stream"))
    ev = load_table(spark, SF, "events")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(out)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(out)
    return out


def _reg_map(df) -> dict:
    return {(r["g"], r["bucket"]): r["m"] for r in df.collect()}


def test_streaming_registers_match_batch(spark, events_dir):
    stream = events_file_stream(spark, events_dir)
    assert stream.isStreaming
    write_stream_to_memory(hll_register_stream(stream), "t_hll_regs")
    got = _reg_map(spark.table("t_hll_regs"))
    exp = _reg_map(hll_registers(load_table(spark, SF, "events")))
    assert got == exp


def test_landed_register_table_matches_batch_and_is_replay_safe(
    spark, events_dir, tmp_path
):
    table = str(tmp_path / "hll_table")
    q = write_stream_hll_ingest(
        events_file_stream(spark, events_dir),
        table,
        str(tmp_path / "ckpt1"),
    )
    q.awaitTermination()
    exp = _reg_map(hll_registers(load_table(spark, SF, "events")))
    assert _reg_map(spark.read.parquet(table)) == exp

    # full replay from a FRESH checkpoint (worst-case at-least-once):
    # register-wise MAX makes it a no-op
    q2 = write_stream_hll_ingest(
        events_file_stream(spark, events_dir),
        table,
        str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination()
    assert _reg_map(spark.read.parquet(table)) == exp


def test_landed_merge_preserves_disjoint_seeded_groups(spark, tmp_path):
    """Merging a batch DISJOINT from the seeded table must keep every
    seeded register (the replay test above can't detect old-table loss:
    its replayed batch regenerates identical registers).  This is the
    regression guard for the read-merge-overwrite swap in
    write_stream_hll_ingest: the merged frame is pinned driver-side
    before table_path is touched, then swapped in by rename."""
    table = str(tmp_path / "hll_table_seeded")
    seeded = spark.createDataFrame(
        [("seed_only_group", b, 3) for b in range(5)], "g string, bucket int, m int"
    )
    seeded.coalesce(1).write.parquet(table)

    events_dir = str(tmp_path / "ev")
    ev = load_table(spark, SF, "events").limit(200)
    ev.coalesce(1).write.parquet(events_dir)

    q = write_stream_hll_ingest(
        events_file_stream(spark, events_dir), table, str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    got = _reg_map(spark.read.parquet(table))
    # every seeded register survives the merge unchanged...
    for b in range(5):
        assert got[("seed_only_group", b)] == 3
    # ...and the batch's own registers landed alongside
    exp_new = _reg_map(hll_registers(ev))
    for k, v in exp_new.items():
        assert got[k] == v
    # nothing else: union of the two keyspaces exactly
    assert set(got) == set(exp_new) | {("seed_only_group", b) for b in range(5)}


def test_landed_merge_recovers_interrupted_swap(spark, tmp_path):
    """A crash BETWEEN the two swap renames leaves the old table at
    '<table>.old-<batch_id>' and nothing at table_path; the next merge
    must restore that generation before merging — without it, the
    batch would silently rebuild the table from itself alone (advice
    r6).  Simulated by renaming the table aside, exactly the
    mid-crash filesystem state."""
    import os

    table = str(tmp_path / "hll_table_crash")
    seeded = spark.createDataFrame(
        [("crash_group", b, 7) for b in range(4)], "g string, bucket int, m int"
    )
    seeded.coalesce(1).write.parquet(table)
    os.rename(table, table + ".old-41")  # mid-swap crash state

    events_dir = str(tmp_path / "ev")
    ev = load_table(spark, SF, "events").limit(100)
    ev.coalesce(1).write.parquet(events_dir)
    q = write_stream_hll_ingest(
        events_file_stream(spark, events_dir), table, str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    got = _reg_map(spark.read.parquet(table))
    for b in range(4):  # pre-crash registers survived the recovery
        assert got[("crash_group", b)] == 7
    for k, v in _reg_map(hll_registers(ev)).items():
        assert got[k] == v
    # stale generations cleaned up after the successful swap
    assert not [p for p in os.listdir(str(tmp_path)) if ".old-" in p]
