"""Dashboard query layer — EP3 parity (streamlit_app.py display_*
functions as named DataFrame queries, SURVEY.md §3 entry point 3).

Each function takes typed silver DataFrames (schemas.py family A) and
returns the exact relation the corresponding dashboard view renders —
callable from any front end.  Formats (MM:SS:mmm strings etc.) are
applied only here, at the presentation edge; everything upstream stays
double-seconds/timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.timefmt import fmt_mmssms

__all__ = [
    "lap_times",
    "session_results_sorted",
    "weather_trends",
    "stint_pivot",
    "telemetry_compare",
]


def lap_times(laps: DataFrame, drivers: list[str] | None = None) -> DataFrame:
    """display_lap_times (streamlit_app.py:76-93,228-246): accurate
    laps only, positive lap time, key columns non-null, optional driver
    IN-list, sorted by (Driver, LapNumber); LapTime re-rendered
    MM:SS:mmm at the edge."""
    out = (
        laps.na.drop(subset=["LapNumber", "LapTimeSeconds", "Driver"])
        .filter(F.col("LapTimeSeconds") > 0)
        .filter(F.col("IsAccurate"))
    )
    if drivers is not None:
        out = out.filter(F.col("Driver").isin(drivers))
    return out.select(
        "Driver",
        "LapNumber",
        "LapTimeSeconds",
        fmt_mmssms("LapTimeSeconds").alias("LapTime"),
        "Compound",
        "Stint",
    ).orderBy("Driver", "LapNumber")


def session_results_sorted(results: DataFrame) -> DataFrame:
    """display_session_results (streamlit_app.py:96-110,203-206): sort
    by Position when present, else by finishing time.

    The dispatch ("does any row carry a Position?") is one single-pass
    boolean aggregate returning a 1-row driver-sized result — not the
    old filter+count() full-row-count action — so the data scan feeds
    exactly one cheap map-side-combined agg before the sort plan is
    chosen.
    """
    row = results.agg(
        F.max(F.col("Position").isNotNull()).alias("has_pos")
    ).first()
    key = "Position" if row is not None and row["has_pos"] else "TimeSeconds"
    return results.orderBy(F.col(key).asc_nulls_last())


#: weather_trends bucket width (seconds of session time).  Weather
#: samples arrive ~1/min, so a 600 s bucket holds ~10 rows; at any
#: realistic multi-season concatenation each bucket stays one task's
#: worth of rows.
WEATHER_BUCKET_S = 600.0


def weather_trends(weather: DataFrame, n_ticks: int = 10) -> DataFrame:
    """display_weather (streamlit_app.py:249-311): weather columns with
    an O7-style deterministic stride downsample flag for axis ticks
    (every ⌈n/ticks⌉-th sample by session time).

    Same two-level global row-numbering as ``stride_downsample``
    (relational.py): SessionTimeSeconds is the leading sort key, so
    time buckets are order-aligned — ``row_number`` runs per bucket
    (partitioned window, never a single-partition global sort), each
    bucket's global offset comes from one metadata-sized bucket-count
    aggregate (collected and rebroadcast), and the total row count for
    the tick step falls out of the same collect — no separate
    ``count()`` scan.  Safe for a concatenated multi-season table, not
    just one session's ~130 samples.
    """
    spark = weather.sparkSession
    # null SessionTimeSeconds → sentinel bucket that sorts before all
    # real buckets (nulls-first, matching the window's ASC default) and
    # stays a valid equi-join key (a null bucket would never match in
    # the broadcast join below)
    null_bucket = -(2**62)
    b = weather.withColumn(
        "bucket",
        F.coalesce(
            F.floor(F.col("SessionTimeSeconds") / F.lit(WEATHER_BUCKET_S)),
            F.lit(null_bucket),
        ),
    )
    counts = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    counts.sort(key=lambda r: r["bucket"])
    total = sum(r["cnt"] for r in counts)
    step = max(1, -(-total // n_ticks))
    offs, acc = [], 0
    for r in counts:
        offs.append((r["bucket"], acc))
        acc += r["cnt"]
    off_df = spark.createDataFrame(offs, schema="bucket long, off long")
    wb = W.partitionBy("bucket").orderBy("SessionTimeSeconds")
    return (
        b.withColumn("lrn", F.row_number().over(wb))
        .join(F.broadcast(off_df), ["bucket"], "inner")  # every bucket has an offset row
        .withColumn("is_tick", ((F.col("off") + F.col("lrn") - 1) % step) == 0)
        .drop("bucket", "lrn", "off")
    )


def stint_pivot(stints: DataFrame) -> DataFrame:
    """display_tyre_stints stacked bar (A7, streamlit_app.py:385-389):
    laps per driver pivoted by compound."""
    compounds = ["SOFT", "MEDIUM", "HARD", "INTERMEDIATE", "WET"]
    return (
        stints.groupBy("Driver")
        .pivot("Compound", compounds)
        .sum("NumLapsInStint")
        .orderBy("Driver")
    )


def stint_chart_rows(stints: DataFrame) -> DataFrame:
    """display_tyre_stints bar rows (streamlit_app.py:382-389) incl.
    the F20 concat label ``'VER - Stint 1'``."""
    return stints.select(
        "Driver",
        "StintNumber",
        "Compound",
        "NumLapsInStint",
        # F.concat, not concat_ws: the reference's pandas `+` chain
        # (streamlit_app.py:388) propagates NaN for a null Driver, and
        # concat_ws would silently swallow the null instead
        F.concat(
            F.col("Driver"), F.lit(" - Stint "), F.col("StintNumber").cast("string")
        ).alias("StintIdentifier"),
    ).orderBy("Driver", "StintNumber")


def telemetry_compare(
    summary: DataFrame, drivers: list[str], metric: str = "AvgSpeed"
) -> DataFrame:
    """display_telemetry comparison (streamlit_app.py:407-444): chosen
    drivers' per-lap metric, sorted for plotting."""
    return (
        summary.filter(F.col("Driver").isin(drivers))
        .select("Driver", "LapNumber", metric)
        .orderBy("Driver", "LapNumber")
    )


def event_info_kv(event_info: DataFrame) -> DataFrame:
    """display_event_info (streamlit_app.py:174-180): the 1-row
    event_info table transposed to (Field, Value) rows — ``df.iloc[0].T``
    as an unpivot over the static schema (plan-time ``stack``, every
    value rendered to its string form; NULL stays NULL like pandas NaN
    renders).  Empty input → empty result (the dashboard's "No event
    information available" branch is presentation, not data).
    """
    cols = event_info.columns
    branches = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    return event_info.limit(1).select(
        F.expr(f"stack({len(cols)}, {branches}) AS (Field, Value)")
    )


def session_header(event_info: DataFrame, fallback_event: str, fallback_session: str) -> tuple[str, str]:
    """Header lookup (streamlit_app.py:510-522): prettier names from
    event_info when present, else the folder-derived fallbacks — the
    same coalesce, minus the silent try/except (a missing column is a
    schema fact here, checked statically)."""
    row = event_info.limit(1).collect()
    if not row:
        return fallback_event, fallback_session
    r = row[0].asDict()
    ev = r.get("EventName") or fallback_event
    se = r.get("SessionNameActual") or fallback_session
    return str(ev), str(se)
