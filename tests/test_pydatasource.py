"""Custom Python DataSource (sources/pydatasource.py) — SURVEY S1."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, In

from f1_data_engineering_spark.sources import pydatasource as P


def _registered(spark):
    P.register(spark)
    return spark


def test_source_shape_and_determinism(spark):
    spark = _registered(spark)
    df = spark.read.format("f1_telemetry").option("laps", 3).load()
    assert df.columns == [
        "driver", "lap", "sample", "ts_offset", "speed",
        "rpm", "throttle", "brake", "gear",
    ]
    assert df.count() == len(P.DRIVERS) * 3 * P.SAMPLES
    # deterministic: two reads produce identical content
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, spark.read.format("f1_telemetry").option("laps", 3).load().collect()))
    assert a == b


def test_driver_filter_returns_only_that_driver(spark):
    spark = _registered(spark)
    df = (
        spark.read.format("f1_telemetry").load()
        .filter(F.col("driver") == "VER")
    )
    rows = df.collect()
    assert rows and all(r["driver"] == "VER" for r in rows)
    assert len(rows) == P.LAPS * P.SAMPLES


def test_pushdown_prunes_partitions_and_returns_rest(spark):
    r = P.TelemetryReader({})
    unsupported = list(
        r.pushFilters([EqualTo(("driver",), "VER"), GreaterThan(("lap",), 2)])
    )
    assert [p.driver for p in r.partitions()] == ["VER"]
    assert unsupported == [GreaterThan(("lap",), 2)]

    r2 = P.TelemetryReader({})
    list(r2.pushFilters([In(("driver",), ("ALO", "HAM"))]))
    assert [p.driver for p in r2.partitions()] == ["ALO", "HAM"]


def test_source_feeds_relational_layer(spark):
    """The custom source must compose with ordinary DataFrame ops —
    per-driver lap aggregation straight off the S1 boundary."""
    spark = _registered(spark)
    agg = (
        spark.read.format("f1_telemetry").load()
        .groupBy("driver", "lap")
        .agg(
            F.avg("speed").alias("avg_speed"),
            F.max("rpm").alias("max_rpm"),
            F.max((F.col("gear") >= 7).cast("int")).alias("reached_g7"),
        )
    )
    rows = agg.collect()
    assert len(rows) == len(P.DRIVERS) * P.LAPS
    assert all(80.0 <= r["avg_speed"] <= 320.0 for r in rows)


def test_streaming_source_lap_by_lap(spark, tmp_path):
    """The streaming leg must deliver every lap exactly once into a
    memory sink and stop producing at max_laps."""
    import time

    P.register_stream(spark)
    q = (
        spark.readStream.format("f1_telemetry_stream")
        .option("max_laps", 3)
        .load()
        .groupBy("lap")
        .count()
        .writeStream.format("memory")
        .queryName("telemetry_stream_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        expect = len(P.DRIVERS) * P.SAMPLES
        deadline = time.time() + 60
        done = False
        while time.time() < deadline and not done:
            time.sleep(1)
            rows = {
                r["lap"]: r["count"]
                for r in spark.sql(
                    "SELECT * FROM telemetry_stream_test"
                ).collect()
            }
            done = rows == {1: expect, 2: expect, 3: expect}
        assert done, f"incomplete stream state: {rows}"
    finally:
        q.stop()


def test_manifest_sink_commit_protocol(spark, tmp_path):
    """Shards become visible only through the manifest; round-trip
    preserves rows; uncommitted temp files are ignored by readers."""
    import json, os

    from f1_data_engineering_spark.sources import pydatasink as S

    S.register_sink(spark)
    df = spark.range(100).selectExpr("id", "id * 2 AS double_id")
    out = str(tmp_path / "sink")
    os.makedirs(out, exist_ok=True)
    df.write.format("jsonl_manifest").mode("append").save(out)

    with open(os.path.join(out, S.MANIFEST)) as f:
        manifest = json.load(f)
    assert manifest["n_rows"] == 100
    assert sum(s["n_rows"] for s in manifest["shards"]) == 100

    # plant a torn shard from a "crashed task" — must stay invisible
    tmp_dir = os.path.join(out, "_tmp")
    os.makedirs(tmp_dir, exist_ok=True)
    with open(os.path.join(tmp_dir, "deadbeef.jsonl"), "w") as f:
        f.write('{"id": 999999, "double_id": 0}\n')

    back = S.read_committed(spark, out)
    assert back.count() == 100
    assert back.filter("id = 999999").count() == 0
    assert {r["id"] for r in back.collect()} == set(range(100))


def test_manifest_sink_append_extends_and_overwrite_replaces(spark, tmp_path):
    """Sequential appends accumulate in the manifest; an overwrite
    replaces the committed set and removes the superseded shards."""
    import json, os

    from f1_data_engineering_spark.sources import pydatasink as S

    S.register_sink(spark)
    out = str(tmp_path / "sink2")
    os.makedirs(out, exist_ok=True)
    spark.range(0, 10).selectExpr("id").write.format("jsonl_manifest").mode(
        "append"
    ).save(out)
    spark.range(10, 25).selectExpr("id").write.format("jsonl_manifest").mode(
        "append"
    ).save(out)
    back = S.read_committed(spark, out)
    assert {r["id"] for r in back.collect()} == set(range(25))
    with open(os.path.join(out, S.MANIFEST)) as f:
        assert json.load(f)["n_rows"] == 25

    spark.range(100, 103).selectExpr("id").write.format("jsonl_manifest").mode(
        "overwrite"
    ).save(out)
    back = S.read_committed(spark, out)
    assert {r["id"] for r in back.collect()} == {100, 101, 102}
    # superseded shards physically removed after the manifest swap
    with open(os.path.join(out, S.MANIFEST)) as f:
        live = {s["file"] for s in json.load(f)["shards"]}
    on_disk = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert on_disk == live


def test_manifest_sink_abort_tolerates_failed_task_message(tmp_path):
    """abort() receives None for the failed task's commit message (the
    pyspark DataSourceWriter contract) — it must skip it and still
    clean the surviving tasks' temp shards."""
    import os

    from f1_data_engineering_spark.sources.pydatasink import (
        ManifestJsonlWriter,
        _ShardCommit,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    out = str(tmp_path / "sink3")
    tmp_dir = os.path.join(out, "_tmp")
    os.makedirs(tmp_dir, exist_ok=True)
    with open(os.path.join(tmp_dir, "aaaa.jsonl"), "w") as f:
        f.write('{"id": 1}\n')
    w = ManifestJsonlWriter(
        out, StructType([StructField("id", LongType())]), overwrite=False
    )
    w.abort([_ShardCommit(tmp_name="aaaa.jsonl", n_rows=1), None])
    assert os.listdir(tmp_dir) == []
