"""Telemetry-engine tests (EP1 step 5) against hand-computed synthetic
session data — both join strategies must agree with each other and
with directly-computed expectations."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_spark.operators.telemetry import (
    lap_telemetry_summary,
    range_join_telemetry,
    tyre_stint_summary,
)
from f1_data_engineering_spark.operators.f1_queries import (
    lap_times,
    stint_pivot,
    telemetry_compare,
    weather_trends,
)


@pytest.fixture(scope="module")
def session_data(spark):
    """2 drivers × 3 laps × 10 samples/lap, fully deterministic."""
    laps = []
    telem = []
    for di, drv in enumerate(["VER", "HAM"]):
        for lap in range(1, 4):
            start = 100.0 * lap + 10.0 * di
            laps.append(
                (
                    drv, di + 1, "T", lap,
                    90.0,  # LapTimeSeconds
                    30.0, 30.0, 30.0,
                    None, None, None,
                    start, None, None, None,
                    1 if lap < 3 else 2,           # Stint
                    "SOFT" if lap < 3 else "HARD",  # Compound
                    lap, True,
                )
            )
            for i in range(10):
                telem.append(
                    (
                        drv,
                        start + i * 9.0,          # inside [start, start+90)
                        100.0 + i,                # Speed
                        10000.0 + 100 * i,        # RPM
                        50.0 + i,                 # Throttle
                        i % 2 == 0,               # Brake
                        3 + (i % 2),              # Gear alternates -> 9 changes
                        8 if (di == 0 and i == 5) else 0,  # DRS for VER only
                    )
                )
    laps_df = spark.createDataFrame(
        laps,
        schema=(
            "Driver string, DriverNumber int, Team string, LapNumber int,"
            "LapTimeSeconds double, Sector1TimeSeconds double,"
            "Sector2TimeSeconds double, Sector3TimeSeconds double,"
            "LapEndTime timestamp, PitInTime timestamp, PitOutTime timestamp,"
            "LapStartSessionSeconds double, Sector1SessionSeconds double,"
            "Sector2SessionSeconds double, Sector3SessionSeconds double,"
            "Stint int, Compound string, TyreLife int, IsAccurate boolean"
        ),
    )
    telem_df = spark.createDataFrame(
        telem,
        schema=(
            "Driver string, SessionTimeSeconds double, Speed double,"
            "RPM double, Throttle double, Brake boolean, Gear int, DRS int"
        ),
    )
    return laps_df, telem_df


def test_range_join_strategies_agree(spark, session_data):
    laps, telem = session_data
    a = range_join_telemetry(telem, laps, "broadcast").orderBy(
        "Driver", "LapNumber", "SessionTimeSeconds"
    )
    b = range_join_telemetry(telem, laps, "bucket").orderBy(
        "Driver", "LapNumber", "SessionTimeSeconds"
    )
    assert a.collect() == b.collect()
    assert a.count() == 60  # every sample lands in exactly one lap


@pytest.mark.parametrize("strategy", ["broadcast", "bucket"])
def test_lap_telemetry_summary(spark, session_data, strategy):
    laps, telem = session_data
    rows = {
        (r["Driver"], r["LapNumber"]): r
        for r in lap_telemetry_summary(telem, laps, strategy).collect()
    }
    assert len(rows) == 6
    r = rows[("VER", 1)]
    # hand-computed: speeds 100..109
    assert r["AvgSpeed"] == pytest.approx(104.5)
    assert r["MaxSpeed"] == 109.0 and r["MinSpeed"] == 100.0
    assert r["AvgRPM"] == pytest.approx(10450.0)
    assert r["AvgThrottle"] == pytest.approx(54.5)
    assert r["AvgBrake"] == pytest.approx(0.5)
    # gear alternates every sample after the first -> 9 changes
    assert r["TotalGearChanges"] == 9
    assert r["DRSActive"] is True
    assert rows[("HAM", 1)]["DRSActive"] is False
    # distance: sum over steps i=1..9 of speed_i/3.6 * 9s
    exp_dist = sum((100.0 + i) / 3.6 * 9.0 for i in range(1, 10))
    assert r["MaxDistance"] == pytest.approx(exp_dist)
    assert r["TelemetryLapStartTime_seconds"] == pytest.approx(100.0)


def test_tyre_stint_summary(spark, session_data):
    laps, _ = session_data
    got = {
        (r["Driver"], r["StintNumber"]): r
        for r in tyre_stint_summary(laps).collect()
    }
    assert got[("VER", 1)]["Compound"] == "SOFT"
    assert got[("VER", 1)]["StartLap"] == 1
    assert got[("VER", 1)]["EndLap"] == 2
    assert got[("VER", 1)]["NumLapsInStint"] == 2
    assert got[("HAM", 2)]["Compound"] == "HARD"
    assert got[("HAM", 2)]["NumLapsInStint"] == 1


def test_lap_times_and_pivot(spark, session_data):
    laps, telem = session_data
    lt = lap_times(laps, drivers=["VER"]).collect()
    assert [r["LapNumber"] for r in lt] == [1, 2, 3]
    assert lt[0]["LapTime"] == "01:30:000"
    piv = {r["Driver"]: r for r in stint_pivot(tyre_stint_summary(laps)).collect()}
    assert piv["VER"]["SOFT"] == 2 and piv["VER"]["HARD"] == 1
    assert piv["VER"]["WET"] is None

    cmp_rows = telemetry_compare(
        lap_telemetry_summary(telem, laps), ["VER", "HAM"], "MaxSpeed"
    ).collect()
    assert len(cmp_rows) == 6 and cmp_rows[0]["MaxSpeed"] == 109.0


def test_weather_trends_downsample(spark):
    w = spark.createDataFrame(
        [(float(i), 20.0 + i) for i in range(25)],
        schema="SessionTimeSeconds double, AirTemp double",
    )
    out = weather_trends(w, n_ticks=10).collect()
    ticks = [r["SessionTimeSeconds"] for r in out if r["is_tick"]]
    # step = ceil(25/10) = 3 -> ticks at 0,3,6,...,24
    assert ticks == [float(i) for i in range(0, 25, 3)]


def test_stint_chart_rows_f20(spark, session_data):
    from f1_data_engineering_spark.operators.f1_queries import stint_chart_rows
    from f1_data_engineering_spark.operators.telemetry import tyre_stint_summary

    laps, _ = session_data
    rows = stint_chart_rows(tyre_stint_summary(laps)).collect()
    assert rows[0]["StintIdentifier"] == "HAM - Stint 1"


def test_shift_from_session_start(spark):
    """F7/J2: absolute time = session start + float-second offset,
    sub-second-safe."""
    from f1_data_engineering_spark.functions.timefmt import shift_from_session_start
    import datetime as dt
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(dt.datetime(2024, 3, 2, 15, 0, 0), 90.456)],
        schema="start timestamp, offset double",
    )
    got = df.select(
        shift_from_session_start("start", "offset").alias("abs_ts")
    ).collect()[0]["abs_ts"]
    assert got == dt.datetime(2024, 3, 2, 15, 1, 30, 456000)


def test_event_info_kv_transpose(spark):
    from f1_data_engineering_spark.operators.f1_queries import (
        event_info_kv,
        session_header,
    )

    ei = spark.createDataFrame(
        [(2024, "Monaco Grand Prix", "Race", None)],
        "Year int, EventName string, SessionNameActual string, Note string",
    )
    kv = {r["Field"]: r["Value"] for r in event_info_kv(ei).collect()}
    assert kv == {
        "Year": "2024",
        "EventName": "Monaco Grand Prix",
        "SessionNameActual": "Race",
        "Note": None,
    }
    assert session_header(ei, "folder_ev", "folder_se") == (
        "Monaco Grand Prix", "Race",
    )
    empty = ei.filter("Year = 0")
    assert session_header(empty, "folder_ev", "folder_se") == (
        "folder_ev", "folder_se",
    )


def test_weather_trends_matches_naive_reference(spark):
    """The two-level bucketed tick plan (round-4 rewrite: bucket-local
    row_number + broadcast offsets, no partition-less window) must mark
    exactly the rows a naive sorted-enumerate reference marks, across
    sizes that straddle bucket boundaries, for unevenly-spaced and
    bucket-sparse streams."""
    import math

    from hypothesis import given, settings, strategies as st

    from f1_data_engineering_spark.operators.f1_queries import (
        WEATHER_BUCKET_S,
        weather_trends,
    )

    cases = []

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            # span many buckets with gaps; unique times keep the naive
            # reference well-defined
            st.integers(0, 40 * int(WEATHER_BUCKET_S)),
            min_size=1,
            max_size=60,
            unique=True,
        ),
        st.integers(1, 12),
    )
    def collect(times, n_ticks):
        cases.append((sorted(float(t) for t in times), n_ticks))

    collect()
    for times, n_ticks in cases:
        df = spark.createDataFrame(
            [(t, 20.0) for t in times],
            schema="SessionTimeSeconds double, AirTemp double",
        )
        got = {
            r["SessionTimeSeconds"]
            for r in weather_trends(df, n_ticks=n_ticks).collect()
            if r["is_tick"]
        }
        step = max(1, math.ceil(len(times) / n_ticks))
        exp = set(times[::step])
        assert got == exp, (times, n_ticks)


def test_session_results_sorted_dispatch(spark):
    """Position present -> Position order; all-NULL Position -> time
    order; empty input -> empty output (the round-4 single-pass-agg
    dispatch, no full count() action)."""
    from f1_data_engineering_spark.operators.f1_queries import (
        session_results_sorted,
    )

    schema = "Driver string, Position int, TimeSeconds double"
    with_pos = spark.createDataFrame(
        [("HAM", 2, 95.0), ("VER", 1, 94.0), ("LEC", None, 90.0)], schema
    )
    rows = session_results_sorted(with_pos).collect()
    assert [r["Driver"] for r in rows] == ["VER", "HAM", "LEC"]  # nulls last

    no_pos = spark.createDataFrame(
        [("HAM", None, 95.0), ("VER", None, 94.0)], schema
    )
    rows = session_results_sorted(no_pos).collect()
    assert [r["Driver"] for r in rows] == ["VER", "HAM"]  # by TimeSeconds

    empty = spark.createDataFrame([], schema)
    assert session_results_sorted(empty).collect() == []
