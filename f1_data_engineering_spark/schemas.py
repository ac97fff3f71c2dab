"""Explicit StructType schemas.

The reference enforces schema via per-file column-name dictionaries
(reference: src/transform/f1_dataTransformer.py:100-122) and otherwise
infers on read.  Here every table has a real schema — no inference cost,
no ambiguity, and Parquet scans prune columns against it.

Two families:

* F1-native tables (FIXTURES.md §A): the six tables the reference
  extracts per (year, event, session) — event_info, session_results,
  laps_data, lap_telemetry_summary, weather_data, tyre_stints_summary —
  plus the transient per-lap telemetry stream the reference aggregates
  away (reference: src/extract/f1_dataExtractor.py:255), which is a
  first-class fact table here.
* Driver test tables (TESTDATA.md): TPC-H-ish star schema + events /
  documents / embeddings, matching /root/testdata/sf*/ parquet exactly.

Durations are stored canonically as DOUBLE seconds (the reference itself
always passes through float seconds — f1_dataExtractor.py:28-35); the
custom ``MM:SS:mmm``-style strings are presentation-edge only
(see functions.timefmt).
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "EVENT_INFO",
    "SESSION_RESULTS",
    "LAPS_DATA",
    "LAP_TELEMETRY_SUMMARY",
    "WEATHER_DATA",
    "TYRE_STINTS_SUMMARY",
    "TELEMETRY_STREAM",
    "F1_TABLES",
    "TEST_TABLES",
    "TEST_TABLE_NAMES",
]


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# ---------------------------------------------------------------------------
# Family A — F1-native tables (FIXTURES.md; reference f1_dataExtractor.py)
# ---------------------------------------------------------------------------

#: 1 row per session (reference: f1_dataExtractor.py:166-178)
EVENT_INFO = T.StructType(
    [
        _f("Year", T.IntegerType(), False),
        _f("EventName", T.StringType(), False),
        _f("EventDate", T.TimestampType()),
        _f("Country", T.StringType()),
        _f("Location", T.StringType()),
        _f("SessionKey", T.StringType(), False),
        _f("SessionNameActual", T.StringType()),
        _f("SessionStartDateLocalISO", T.TimestampType()),
        _f("SessionStartTimeZone", T.StringType()),
        _f("SessionStartDateUTCISO", T.TimestampType()),
    ]
)

#: 1 row per driver per session (reference: f1_dataExtractor.py:181-192)
SESSION_RESULTS = T.StructType(
    [
        _f("DriverNumber", T.IntegerType()),
        _f("Driver", T.StringType(), False),
        _f("Abbreviation", T.StringType()),
        _f("TeamName", T.StringType()),
        _f("Position", T.IntegerType()),
        _f("TimeSeconds", T.DoubleType()),      # winner total / gap, secs
        _f("Q1Seconds", T.DoubleType()),
        _f("Q2Seconds", T.DoubleType()),
        _f("Q3Seconds", T.DoubleType()),
        _f("IntervalSeconds", T.DoubleType()),
        _f("Laps", T.IntegerType()),
        _f("Status", T.StringType()),
    ]
)

#: 1 row per (Driver, LapNumber) (reference: f1_dataExtractor.py:197-245)
LAPS_DATA = T.StructType(
    [
        _f("Driver", T.StringType(), False),
        _f("DriverNumber", T.IntegerType()),
        _f("Team", T.StringType()),
        _f("LapNumber", T.IntegerType(), False),
        _f("LapTimeSeconds", T.DoubleType()),
        _f("Sector1TimeSeconds", T.DoubleType()),
        _f("Sector2TimeSeconds", T.DoubleType()),
        _f("Sector3TimeSeconds", T.DoubleType()),
        _f("LapEndTime", T.TimestampType()),      # absolute UTC at lap end
        _f("PitInTime", T.TimestampType()),
        _f("PitOutTime", T.TimestampType()),
        _f("LapStartSessionSeconds", T.DoubleType()),
        _f("Sector1SessionSeconds", T.DoubleType()),
        _f("Sector2SessionSeconds", T.DoubleType()),
        _f("Sector3SessionSeconds", T.DoubleType()),
        _f("Stint", T.IntegerType()),
        _f("Compound", T.StringType()),
        _f("TyreLife", T.IntegerType()),
        _f("IsAccurate", T.BooleanType()),
    ]
)

#: 1 row per (Driver, LapNumber) w/ telemetry (reference: f1_dataExtractor.py:262-300)
LAP_TELEMETRY_SUMMARY = T.StructType(
    [
        _f("Driver", T.StringType(), False),
        _f("LapNumber", T.IntegerType(), False),
        _f("TotalGearChanges", T.IntegerType()),
        _f("TelemetryLapStartTime_seconds", T.DoubleType()),
        _f("AvgSpeed", T.DoubleType()),
        _f("MaxSpeed", T.DoubleType()),
        _f("MinSpeed", T.DoubleType()),
        _f("AvgRPM", T.DoubleType()),
        _f("MaxRPM", T.DoubleType()),
        _f("AvgThrottle", T.DoubleType()),
        _f("AvgBrake", T.DoubleType()),
        _f("MaxDistance", T.DoubleType()),
        _f("DRSActive", T.BooleanType()),
    ]
)

#: 1 row per weather sample, ~1/min (reference: f1_dataExtractor.py:311-329)
WEATHER_DATA = T.StructType(
    [
        _f("SessionTimeSeconds", T.DoubleType(), False),
        _f("SampleTime", T.TimestampType()),
        _f("AirTemp", T.DoubleType()),
        _f("TrackTemp", T.DoubleType()),
        _f("Humidity", T.DoubleType()),
        _f("Pressure", T.DoubleType()),
        _f("WindSpeed", T.DoubleType()),
        _f("WindDirection", T.IntegerType()),
        _f("Rainfall", T.BooleanType()),
    ]
)

#: 1 row per (Driver, StintNumber) (reference: f1_dataExtractor.py:334-358)
TYRE_STINTS_SUMMARY = T.StructType(
    [
        _f("Driver", T.StringType(), False),
        _f("StintNumber", T.IntegerType(), False),
        _f("Compound", T.StringType()),
        _f("StartLap", T.IntegerType()),
        _f("EndLap", T.IntegerType()),
        _f("NumLapsInStint", T.LongType()),
    ]
)

#: High-frequency telemetry samples — transient in the reference
#: (aggregated away at f1_dataExtractor.py:255-287), a first-class fact
#: table (and streaming source) here.
TELEMETRY_STREAM = T.StructType(
    [
        _f("Driver", T.StringType(), False),
        _f("SessionTimeSeconds", T.DoubleType(), False),
        _f("Speed", T.DoubleType()),
        _f("RPM", T.DoubleType()),
        _f("Throttle", T.DoubleType()),
        _f("Brake", T.BooleanType()),
        _f("Gear", T.IntegerType()),
        _f("DRS", T.IntegerType()),
    ]
)

F1_TABLES: dict[str, T.StructType] = {
    "event_info": EVENT_INFO,
    "session_results": SESSION_RESULTS,
    "laps_data": LAPS_DATA,
    "lap_telemetry_summary": LAP_TELEMETRY_SUMMARY,
    "weather_data": WEATHER_DATA,
    "tyre_stints_summary": TYRE_STINTS_SUMMARY,
    "telemetry_stream": TELEMETRY_STREAM,
}


# ---------------------------------------------------------------------------
# Family B — driver test tables (/root/testdata/sf*/, TESTDATA.md)
# ---------------------------------------------------------------------------

TEST_TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [_f("r_regionkey", T.IntegerType(), False), _f("r_name", T.StringType())]
    ),
    "nation": T.StructType(
        [
            _f("n_nationkey", T.IntegerType(), False),
            _f("n_name", T.StringType()),
            _f("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            _f("c_custkey", T.LongType(), False),
            _f("c_name", T.StringType()),
            _f("c_nationkey", T.IntegerType()),
            _f("c_acctbal", T.DoubleType()),
            _f("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            _f("s_suppkey", T.LongType(), False),
            _f("s_name", T.StringType()),
            _f("s_nationkey", T.IntegerType()),
            _f("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            _f("p_partkey", T.LongType(), False),
            _f("p_name", T.StringType()),
            _f("p_brand", T.StringType()),
            _f("p_type", T.StringType()),
            _f("p_size", T.IntegerType()),
            _f("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            _f("o_orderkey", T.LongType(), False),
            _f("o_custkey", T.LongType()),
            _f("o_orderstatus", T.StringType()),
            _f("o_totalprice", T.DoubleType()),
            _f("o_orderdate", T.TimestampType()),
            _f("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            _f("l_orderkey", T.LongType(), False),
            _f("l_partkey", T.LongType()),
            _f("l_suppkey", T.LongType()),
            _f("l_linenumber", T.IntegerType()),
            _f("l_quantity", T.DoubleType()),
            _f("l_extendedprice", T.DoubleType()),
            _f("l_discount", T.DoubleType()),
            _f("l_tax", T.DoubleType()),
            _f("l_returnflag", T.StringType()),
            _f("l_linestatus", T.StringType()),
            _f("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            _f("event_id", T.LongType(), False),
            _f("ts", T.TimestampType()),
            _f("user_id", T.LongType()),
            _f("event_type", T.StringType()),
            _f("value", T.DoubleType()),
            _f("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            _f("doc_id", T.LongType(), False),
            _f("text", T.StringType()),
            _f("lang", T.StringType()),
            _f("source", T.StringType()),
            _f("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            _f("vec_id", T.LongType(), False),
            _f("embedding", T.ArrayType(T.FloatType())),
            _f("label", T.IntegerType()),
        ]
    ),
}

TEST_TABLE_NAMES = tuple(TEST_TABLES)
