"""End-to-end integration: raw session CSVs → typed silver lake →
telemetry engine → dashboard queries — the full EP1→EP3 chain on one
synthetic session."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from f1_data_engineering_spark.operators.f1_queries import lap_times, stint_pivot
from f1_data_engineering_spark.operators.telemetry import (
    lap_telemetry_summary,
    tyre_stint_summary,
)
from f1_data_engineering_spark.pipeline import ingest_session_tree


def test_full_chain(spark, tmp_path):
    raw = tmp_path / "raw"
    lake = str(tmp_path / "lake")
    d = raw / "2024" / "Monaco_Grand_Prix" / "R"
    d.mkdir(parents=True)

    # laps_data as the extractor writes it: MM:SS:mmm lap/sector times
    lap_rows = ["Driver,LapNumber,LapTime,Stint,Compound,IsAccurate"]
    for drv in ("VER", "LEC"):
        for lap in range(1, 4):
            lap_rows.append(f"{drv},{lap},01:{20+lap:02d}:500,1,SOFT,True")
    (d / "laps_data.csv").write_text("\n".join(lap_rows) + "\n")

    ingest_session_tree(spark, str(raw), lake, tables=("laps_data",))
    silver = spark.read.parquet(os.path.join(lake, "laps_data"))

    # silver is typed: LapTime parsed to double seconds
    assert dict(silver.dtypes)["LapTime"] == "double"
    assert silver.count() == 6
    v = silver.filter((F.col("Driver") == "VER") & (F.col("LapNumber") == 1))
    assert v.collect()[0]["LapTime"] == 81.5

    # dashboard layer over the silver lake (adapt column names)
    laps = silver.select(
        "Driver",
        F.col("LapNumber").cast("int").alias("LapNumber"),
        F.col("LapTime").alias("LapTimeSeconds"),
        (F.col("LapNumber") * 100.0).alias("LapStartSessionSeconds"),
        F.col("Stint").cast("int").alias("Stint"),
        "Compound",
        F.lit(True).alias("IsAccurate"),
    )
    lt = lap_times(laps, drivers=["VER"]).collect()
    assert [r["LapTime"] for r in lt] == ["01:21:500", "01:22:500", "01:23:500"]

    stints = tyre_stint_summary(laps)
    piv = stint_pivot(stints).collect()
    assert {r["Driver"]: r["SOFT"] for r in piv} == {"VER": 3, "LEC": 3}

    # telemetry engine over a generated stream for the same laps
    telem = spark.createDataFrame(
        [
            (drv, lap * 100.0 + i * 8.0, 150.0 + i, 11000.0, 60.0, False, 5, 0)
            for drv in ("VER", "LEC")
            for lap in range(1, 4)
            for i in range(10)
        ],
        schema=(
            "Driver string, SessionTimeSeconds double, Speed double, RPM double,"
            "Throttle double, Brake boolean, Gear int, DRS int"
        ),
    )
    summ = lap_telemetry_summary(telem, laps)
    rows = summ.collect()
    assert len(rows) == 6
    assert all(r["TotalGearChanges"] == 0 for r in rows)
    assert all(abs(r["AvgSpeed"] - 154.5) < 1e-9 for r in rows)


def test_source_to_sink_chain(spark, tmp_path):
    """Second full chain through the Spark-4 custom boundary: pluggable
    telemetry SOURCE (partition-per-driver, pushdown) → per-lap
    aggregation → manifest-commit SINK → committed read-back."""
    from f1_data_engineering_spark.sources import pydatasink as SK
    from f1_data_engineering_spark.sources import pydatasource as SRC

    SRC.register(spark)
    SK.register_sink(spark)

    per_lap = (
        spark.read.format("f1_telemetry").option("laps", 2).load()
        .groupBy("driver", "lap")
        .agg(
            F.round(F.avg("speed"), 3).alias("avg_speed"),
            F.max("rpm").alias("max_rpm"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )
    out = str(tmp_path / "telemetry_gold")
    os.makedirs(out, exist_ok=True)
    per_lap.write.format("jsonl_manifest").mode("append").save(out)

    back = SK.read_committed(spark, out)
    assert back.count() == len(SRC.DRIVERS) * 2
    assert set(back.columns) == {
        "driver", "lap", "avg_speed", "max_rpm", "n_samples",
    }
    assert back.filter(F.col("n_samples") != SRC.SAMPLES).count() == 0
    # round-trip values agree with the in-memory frame
    a = {(r["driver"], r["lap"]): r["avg_speed"] for r in per_lap.collect()}
    b = {(r["driver"], r["lap"]): r["avg_speed"] for r in back.collect()}
    assert a == b
