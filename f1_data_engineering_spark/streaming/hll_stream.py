"""Streaming HyperLogLog: distinct-count sketch maintenance over an
unbounded event stream.

The batch side is ``operators/analytics4.hll_distinct_users``; this is
its streaming twin, in the two canonical shapes:

* **In-flight state** (:func:`hll_register_stream`): the register
  table AS a streaming aggregation — ``groupBy(group, bucket).max(rho)``.
  The state-boundedness argument is the whole point: unlike a windowed
  count (state ∝ active windows) or a streaming distinct (state ∝
  distinct keys ever seen), HLL state is **groups × 256 registers, a
  CONSTANT in stream length** — no watermark needed, no expiry, the
  one streaming aggregate that can run forever in complete mode.  MAX
  is also insensitive to at-least-once replays (re-applying a row is
  a no-op), so recovery cannot corrupt the sketch.
* **Landed sketch table** (:func:`write_stream_hll_ingest`): per
  micro-batch, build the BATCH registers and merge them into a stored
  register table by register-wise MAX via ``foreachBatch`` — the
  pattern for serving sketches to other jobs (the batch algebra in
  ``hll_intersection_estimate`` reads exactly this table shape).
  Idempotent under batch replay for the same reason as above, so
  checkpoint recovery is exactly-once in effect.

Batch/stream parity — registers from either leg are IDENTICAL to the
batch operator's (same md5 hash, same rho) — is pinned in
tests/test_hll_stream.py.

Scale: per micro-batch work is one hash aggregate on (group, bucket)
with at most 256 partials per group per task crossing the shuffle; the
stored table is O(groups × 256) rows regardless of stream volume.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.analytics4 import HLL_M, HLL_P, HLL_RHO_BITS, _hll_hash

__all__ = ["hll_registers", "hll_register_stream", "write_stream_hll_ingest"]


def hll_registers(events: DataFrame) -> DataFrame:
    """(g, bucket, m) HLL registers of ``user_id`` per event type —
    works identically on a batch or streaming frame (the expression is
    pure scan-side + one aggregate)."""
    ev = events.filter(F.col("user_id").isNotNull()).select(
        F.coalesce(F.col("event_type"), F.lit("none")).alias("g"),
        F.col("user_id").cast("string").alias("k"),
    )
    h = _hll_hash(F.col("k"))
    # integer shift, not double division: floor(h / 2^P) via / promotes
    # the 60-bit hash to double (53-bit mantissa) and is off-by-one for
    # ~17% of hashes; shiftright is exact and matches the oracle's h // m
    w = F.shiftright(h, HLL_P)
    rho = F.when(w == 0, F.lit(HLL_RHO_BITS + 1)).otherwise(
        F.lit(HLL_RHO_BITS + 1) - F.length(F.bin(w))
    )
    return (
        ev.select("g", (h % HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_register_stream(stream: DataFrame) -> DataFrame:
    """The register table as a streaming aggregation.  State is
    groups × 256 rows — constant in stream length — so this aggregate
    needs no watermark and never expires state."""
    return hll_registers(stream)


def write_stream_hll_ingest(
    stream: DataFrame, table_path: str, checkpoint_path: str
):
    """Maintain a LANDED register table from the stream: per
    micro-batch, compute the batch's registers and merge them into
    ``table_path`` by register-wise MAX (read-merge-overwrite of an
    O(groups × 256) table — driver-trivial at any stream volume).
    Register-wise MAX is idempotent and commutative, so replayed or
    reordered batches cannot change the final table.

    Durability note: the swap below uses POSIX ``os.rename`` /
    ``shutil.rmtree``, i.e. it assumes a LOCAL filesystem (the sandbox
    target).  On an object store or HDFS deployment, replace the swap
    with the committer-backed ``mode("overwrite")`` write or a manifest
    pointer flip.  A crash can land between the two renames (old table
    moved aside, new one not yet in place), so every merge starts by
    restoring the newest ``.old-<batch_id>`` generation if
    ``table_path`` is missing — without it, the next batch would
    silently rebuild the table from that batch alone."""

    def recover() -> None:
        base = table_path.rstrip("/")
        if not os.path.isdir(table_path):
            olds = glob.glob(f"{base}.old-*")
            if olds:
                newest = max(
                    olds, key=lambda p: int(p.rsplit("-", 1)[1])
                )
                os.rename(newest, table_path)
        # stale generations/temps from crashed swaps are dead weight
        for p in glob.glob(f"{base}.old-*") + glob.glob(f"{base}.tmp-*"):
            shutil.rmtree(p, ignore_errors=True)

    def merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        recover()
        new = hll_registers(batch)
        if os.path.isdir(table_path):
            old = spark.read.parquet(table_path)
            new = (
                old.unionByName(new)
                .groupBy("g", "bucket")
                .agg(F.max("m").alias("m"))
            )
        # Pin the merged rows in driver memory BEFORE touching
        # table_path: mode("overwrite") is delete-before-write on some
        # FS/version combinations, so a lazy plan still reading
        # table_path could race its own delete, and a mid-write failure
        # would lose the landed table.  The table is O(groups × 256)
        # rows by construction, so the collect is bounded.
        pinned = spark.createDataFrame(new.collect(), schema=new.schema)
        # write to a temp path, then swap via rename: a crash never
        # leaves a HALF-WRITTEN directory at table_path — either the
        # new table is in place, or recover() restores the old one from
        # its .old-<batch_id> generation on the next merge
        base = table_path.rstrip("/")
        tmp, swap = f"{base}.tmp-{batch_id}", f"{base}.old-{batch_id}"
        pinned.coalesce(1).write.mode("overwrite").parquet(tmp)
        if os.path.isdir(table_path):
            os.rename(table_path, swap)
        os.rename(tmp, table_path)
        if os.path.isdir(swap):
            shutil.rmtree(swap)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
