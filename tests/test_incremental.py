"""Continuous hourly rollup over the versioned lake
(operators/incremental.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from f1_data_engineering_spark.operators import incremental as INC
from f1_data_engineering_spark.sources import versioned as V


def _events(spark, start_h, n, base_val):
    rows = [
        (dt.datetime(2024, 5, 1, start_h + i // 4, (i % 4) * 10), base_val + i)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "ts timestamp, value double")


def _as_dict(df):
    return {
        r["bucket"]: (r["n"], r["sum_value"]) for r in df.collect()
    }


def test_incremental_rollup_tracks_full(spark, tmp_path):
    base = str(tmp_path / "events")
    state = str(tmp_path / "rollup")

    V.write_versioned(_events(spark, 0, 8, 1.0), base, "overwrite")   # v0
    v = INC.advance_hourly_rollup(spark, base, state)
    assert v == 0
    assert _as_dict(INC.rollup_state(spark, state).drop("base_version")) == \
        _as_dict(INC.full_hourly_rollup(spark, base))

    # two more appends, one advance over both
    V.write_versioned(_events(spark, 1, 6, 100.0), base, "append")    # v1
    V.write_versioned(_events(spark, 5, 4, 7.0), base, "append")      # v2
    v = INC.advance_hourly_rollup(spark, base, state)
    assert v == 2
    got = _as_dict(INC.rollup_state(spark, state).drop("base_version"))
    want = _as_dict(INC.full_hourly_rollup(spark, base))
    assert got == want

    # idempotent when nothing new
    assert INC.advance_hourly_rollup(spark, base, state) == 2


def test_incremental_rollup_rebuilds_after_overwrite(spark, tmp_path):
    base = str(tmp_path / "events2")
    state = str(tmp_path / "rollup2")
    V.write_versioned(_events(spark, 0, 8, 1.0), base, "overwrite")
    INC.advance_hourly_rollup(spark, base, state)

    V.write_versioned(_events(spark, 2, 4, 50.0), base, "overwrite")  # resets
    v = INC.advance_hourly_rollup(spark, base, state)
    assert v == 1
    got = _as_dict(INC.rollup_state(spark, state).drop("base_version"))
    assert got == _as_dict(INC.full_hourly_rollup(spark, base))
    # pre-overwrite hours are gone from the state after rebuild
    assert all(b.hour >= 2 for b in got)
