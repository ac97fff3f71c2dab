"""End-to-end ingest test: raw CSV session tree → partitioned typed
silver lake, idempotent re-runs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from f1_data_engineering_spark.pipeline import ingest_session_tree


def _write_session(root, year, event, session, rows):
    d = root / str(year) / event / session
    d.mkdir(parents=True, exist_ok=True)
    (d / "session_results.csv").write_text(
        "Driver,Time,Q1,Interval\n" + "\n".join(rows) + "\n"
    )


def test_ingest_session_tree(spark, tmp_path):
    raw = tmp_path / "raw"
    lake = tmp_path / "lake"
    _write_session(raw, 2024, "Bahrain_Grand_Prix", "R",
                   ["VER,01:30:45:123,01:05:123,12.345",
                    "HAM,01:30:50:000,01:06:000,17.222"])
    _write_session(raw, 2024, "Bahrain_Grand_Prix", "Q",
                   ["VER,00:20:00:000,01:04:000,0.0"])

    counts = ingest_session_tree(
        spark, str(raw), str(lake), tables=("session_results",)
    )
    assert counts["session_results"] == 3

    back = spark.read.parquet(os.path.join(str(lake), "session_results"))
    assert back.count() == 3
    # typed silver: Time is double seconds, partition cols present
    row = back.filter(
        (F.col("Driver") == "VER") & (F.col("SessionKey") == "R")
    ).collect()[0]
    assert row["Time"] == 5445.123
    assert row["Q1"] == 65.123
    assert row["Interval"] == 12.345
    assert row["Year"] == 2024 and row["EventName"] == "Bahrain_Grand_Prix"

    # idempotent re-run of ONE session leaves the other intact
    _write_session(raw, 2024, "Bahrain_Grand_Prix", "R",
                   ["VER,01:30:45:123,01:05:123,99.0"])
    ingest_session_tree(spark, str(raw), str(lake), tables=("session_results",))
    back2 = spark.read.parquet(os.path.join(str(lake), "session_results"))
    q_rows = back2.filter(F.col("SessionKey") == "Q").count()
    assert q_rows == 1  # Q partition untouched
