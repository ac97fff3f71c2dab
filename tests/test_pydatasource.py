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
