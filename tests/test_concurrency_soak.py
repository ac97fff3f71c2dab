"""Concurrency soak over the lake's optimistic machinery: concurrent
appenders, selective compactions, Bloom builders, and vacuums racing
on one table.  Asserts the invariants the log design promises —
contiguous versions, strictly monotonic commit timestamps, no lost or
duplicated rows, every retained version readable, and the Bloom
manifest union still exact — regardless of interleaving (maintenance
aborts on read-set conflicts are expected and retried)."""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from f1_data_engineering_spark.sources import bloomindex as B
from f1_data_engineering_spark.sources import versioned as V


def test_concurrent_appends_compaction_bloom_vacuum(spark, tmp_path):
    t = str(tmp_path / "soak")
    seed = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    V.write_versioned(seed.repartition(2), t, mode="overwrite")

    N_APPENDERS, N_BATCHES, ROWS = 3, 4, 50
    errors: list[str] = []

    def appender(a: int) -> None:
        try:
            for b in range(N_BATCHES):
                lo = 1000 + a * 10000 + b * ROWS
                df = spark.range(lo, lo + ROWS).select(
                    F.col("id").alias("k"), (F.col("id") * 2).alias("v")
                )
                V.write_versioned(df.coalesce(1), t, mode="append")
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(f"appender{a}: {e}")

    def maintainer() -> None:
        try:
            for _ in range(4):
                try:
                    V.compact_small_files(
                        spark, t, target_rows_per_file=10000, small_rows=500
                    )
                except ValueError:
                    pass  # read-set conflict: the documented retry path
                B.build_bloom_index(spark, t, "k")
                V.vacuum(t, retain_versions=3, min_age_seconds=10_000.0)
        except Exception as e:  # pragma: no cover
            errors.append(f"maintainer: {e}")

    threads = [
        threading.Thread(target=appender, args=(a,)) for a in range(N_APPENDERS)
    ] + [threading.Thread(target=maintainer)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not errors, errors

    es = V.table_history(t)
    versions = [e["version"] for e in es]
    assert versions == list(range(len(es)))  # contiguous, no gaps
    ts = [e["ts"] for e in es]
    assert all(a < b for a, b in zip(ts, ts[1:]))  # strictly monotonic

    # no lost/duplicated rows: seed + every appended batch, exactly once
    snap = V.read_versioned(spark, t)
    expect = 200 + N_APPENDERS * N_BATCHES * ROWS
    assert snap.count() == expect
    assert snap.select("k").distinct().count() == expect

    # every version in the vacuum-retained window reads cleanly
    head = V.latest_version(t)
    for v in range(max(0, head - 3), head + 1):
        assert V.read_versioned(spark, t, version=v).count() > 0

    # bloom probes stay exact through the races (conservative scans
    # for unindexed files, never a false negative)
    B.build_bloom_index(spark, t, "k")
    for probe, want in ((0, 1), (1000, 1), (11025, 1), (21199, 1), (10**9, 0)):
        got, scanned, total = B.read_versioned_bloom_pruned(
            spark, t, "k", probe
        )
        assert got.count() == want, (probe, want)
        assert scanned <= total
