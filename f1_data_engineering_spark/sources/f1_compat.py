"""EP2 compatibility transform — the reference's normalizing CSV
round-trip (src/transform/f1_dataTransformer.py:96-207) as one lazy
Spark dataflow.

Semantics reproduced exactly:

* duration-string columns parse format-agnostically (F9) and re-emit
  in the TARGET format of the column map — e.g. session_results
  Q1/Q2/Q3 arrive ``MM:SS:mmm`` from the extractor
  (f1_dataExtractor.py:188-189) and leave ``HH:MM:SS:mmm``
  (f1_dataTransformer.py:101);
* ISO strings → timestamps (coerce-to-null);
* numeric-seconds columns (Interval, TelemetryLapStartTime_seconds) →
  seconds, re-emitted ``HH:MM:SS:mmm``;
* formatters TRUNCATE (F10/F11, ``int(total_seconds()*1000)``);
* a file with no mapped columns is skipped entirely (work elision,
  f1_dataTransformer.py:199-200).

Architecture note: in the lakehouse design this stage is the
bronze→silver hop — the typed frame (double seconds / timestamps) is
the real product and lands in Parquet; the formatted CSV is a
compatibility sink for consumers of the reference's file format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timefmt import fmt_hhmmssms, fmt_mmssms, parse_f1_duration
from .csvio import read_csv_all_string

__all__ = [
    "STRING_COLUMNS_TO_TIMEDELTA",
    "ISO_STRING_COLUMNS_TO_DATETIME",
    "NUMERIC_SECONDS_COLUMNS_TO_TIMEDELTA",
    "transform_table",
    "transform_csv_tree",
]

#: table → {duration-string column: OUTPUT format key}
#: (f1_dataTransformer.py:98-110; keys are output formats — inputs are
#: auto-detected by the parser)
STRING_COLUMNS_TO_TIMEDELTA: dict[str, dict[str, str]] = {
    "session_results": {
        "Time": "hhmmssms",
        "Q1": "hhmmssms",
        "Q2": "hhmmssms",
        "Q3": "hhmmssms",
    },
    "laps_data": {
        "LapTime": "mmssms",
        "Sector1Time": "mmssms",
        "Sector2Time": "mmssms",
        "Sector3Time": "mmssms",
        "Time": "hhmmssms",
        "PitInTime": "hhmmssms",
        "PitOutTime": "hhmmssms",
        "Sector1SessionTime": "hhmmssms",
        "Sector2SessionTime": "hhmmssms",
        "Sector3SessionTime": "hhmmssms",
        "LapStartTime": "hhmmssms",
    },
    "weather_data": {"Time": "hhmmssms"},
}

#: (f1_dataTransformer.py:114-116)
ISO_STRING_COLUMNS_TO_DATETIME: dict[str, list[str]] = {
    "event_info": ["EventDate", "SessionStartDateLocalISO", "SessionStartDateUTCISO"],
}

#: (f1_dataTransformer.py:119-122); output defaults to hhmmssms
NUMERIC_SECONDS_COLUMNS_TO_TIMEDELTA: dict[str, list[str]] = {
    "session_results": ["Interval"],
    "lap_telemetry_summary": ["TelemetryLapStartTime_seconds"],
}

_FORMATTERS = {
    "hhmmssms": lambda c: fmt_hhmmssms(c, rounding="trunc"),
    "mmssms": lambda c: fmt_mmssms(c, rounding="trunc"),
}


def transform_table(df: DataFrame, table: str) -> tuple[DataFrame, DataFrame, int]:
    """All-string frame → (typed silver frame, compat-formatted frame,
    #columns transformed).

    The typed frame holds double seconds / timestamps (the engine's
    canonical representation); the compat frame re-serializes exactly
    as the reference's transformer writes its output CSVs.
    """
    typed = df
    n = 0
    out_formats: dict[str, str] = {}

    for col, fmt_key in STRING_COLUMNS_TO_TIMEDELTA.get(table, {}).items():
        if col in typed.columns:
            typed = typed.withColumn(col, parse_f1_duration(F.col(col)))
            out_formats[col] = fmt_key
            n += 1

    for col in ISO_STRING_COLUMNS_TO_DATETIME.get(table, []):
        if col in typed.columns:
            # try_to_timestamp = pd.to_datetime(errors='coerce'): ANSI
            # to_timestamp would throw on malformed input
            typed = typed.withColumn(col, F.try_to_timestamp(F.col(col)))
            n += 1

    for col in NUMERIC_SECONDS_COLUMNS_TO_TIMEDELTA.get(table, []):
        if col in typed.columns:
            typed = typed.withColumn(col, F.col(col).try_cast("double"))
            out_formats.setdefault(col, "hhmmssms")
            n += 1

    compat = typed
    for col, fmt_key in out_formats.items():
        compat = compat.withColumn(col, _FORMATTERS[fmt_key](F.col(col)))
    return typed, compat, n


def transform_csv_tree(
    spark: SparkSession, input_dir: str, output_dir: str
) -> dict[str, int]:
    """S6 + EP2: walk the ``<year>/<event>/<session>/<table>.csv`` tree
    (recursive lookup replaces os.walk, f1_dataTransformer.py:219-228),
    transform each known table, mirror the layout to ``output_dir``.
    Files with no mapped columns are skipped (reference behavior).

    Returns {table: columns_transformed}.
    """
    stats: dict[str, int] = {}
    tables = (
        set(STRING_COLUMNS_TO_TIMEDELTA)
        | set(ISO_STRING_COLUMNS_TO_DATETIME)
        | set(NUMERIC_SECONDS_COLUMNS_TO_TIMEDELTA)
    )
    for table in sorted(tables):
        pattern = os.path.join(input_dir, "*", "*", "*", f"{table}.csv")
        try:
            raw = read_csv_all_string(spark, pattern)
        except Exception:
            continue
        _, compat, n = transform_table(raw, table)
        if n == 0:
            continue
        stats[table] = n
        (
            compat.write.mode("overwrite")
            .option("header", True)
            .csv(os.path.join(output_dir, table))
        )
    return stats
