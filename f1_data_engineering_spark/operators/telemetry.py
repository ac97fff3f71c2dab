"""F1 telemetry engine — EP1 step 5 of the reference
(src/extract/f1_dataExtractor.py:250-302), re-architected for Spark.

The reference loops over laps in Python, slicing the telemetry stream
per lap (`lap.get_telemetry()`, f1_dataExtractor.py:251-255) and
aggregating each slice with pandas — O(laps) round trips.  Here the
whole step is ONE dataflow: range-join telemetry to laps, integrate
distance with a running-sum window, aggregate per lap, count gear
changes with a lag window.

Scale design: the laps table is tiny (~20 drivers × ~70 laps per
session) while telemetry is the 100 TB fact stream, so the join must
never shuffle telemetry by anything finer than its natural partition:

* ``strategy='broadcast'`` (default) — laps broadcast; telemetry never
  shuffles at all for the join.  Right whenever laps-per-partition-key
  fits in memory (always, for real F1 data).
* ``strategy='bucket'`` — both sides tagged with a time bucket; laps
  explode to their covering buckets (≤ lap_time/Δ + 1), then an EQUI
  join on (Driver, bucket) + residual band filter.  The 100 TB-safe
  shape when the dimension side is itself huge (SURVEY.md §4.2 b).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = [
    "lap_boundaries",
    "range_join_telemetry",
    "integrate_distance",
    "lap_telemetry_summary",
    "tyre_stint_summary",
]

#: bucket width (seconds) for the bucketized range join — ~1 bucket per
#: lap at F1 lap times, so each lap explodes to ≤ 3 rows.
DEFAULT_BUCKET_S = 60.0


def lap_boundaries(laps: DataFrame) -> DataFrame:
    """Laps with [LapStart, LapEnd) in session seconds.

    End = start + LapTime; the reference's slice semantics
    (fastf1 get_telemetry) select samples within the lap's window.
    """
    return laps.select(
        "Driver",
        "LapNumber",
        F.col("LapStartSessionSeconds").alias("lap_start_s"),
        (F.col("LapStartSessionSeconds") + F.col("LapTimeSeconds")).alias("lap_end_s"),
    ).filter(F.col("lap_start_s").isNotNull() & F.col("lap_end_s").isNotNull())


def range_join_telemetry(
    telemetry: DataFrame,
    laps: DataFrame,
    strategy: str = "broadcast",
    bucket_s: float = DEFAULT_BUCKET_S,
) -> DataFrame:
    """J1: tag each telemetry sample with its (Driver, LapNumber).

    Sample belongs to lap iff Driver matches and
    lap_start_s <= SessionTimeSeconds < lap_end_s.
    """
    b = lap_boundaries(laps)
    band = (
        (F.col("t.SessionTimeSeconds") >= F.col("l.lap_start_s"))
        & (F.col("t.SessionTimeSeconds") < F.col("l.lap_end_s"))
        & (F.col("t.Driver") == F.col("l.Driver"))
    )
    t = telemetry.alias("t")
    if strategy == "broadcast":
        joined = t.join(F.broadcast(b.alias("l")), band)
    elif strategy == "bucket":
        lb = b.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("lap_start_s") / bucket_s),
                    F.floor(F.col("lap_end_s") / bucket_s),
                )
            ),
        )
        tb = t.withColumn(
            "bucket", F.floor(F.col("SessionTimeSeconds") / bucket_s)
        ).alias("t")
        joined = tb.join(
            lb.alias("l"),
            (F.col("t.bucket") == F.col("l.bucket")) & band,
        )
    else:
        raise ValueError(f"strategy must be 'broadcast' or 'bucket', got {strategy!r}")
    return joined.select("t.*", F.col("l.LapNumber").alias("LapNumber")).drop("bucket")


def integrate_distance(tagged: DataFrame) -> DataFrame:
    """A6 (``add_distance``, f1_dataExtractor.py:260): cumulative
    distance within each lap — running sum of Speed[km/h]/3.6 · Δt over
    samples ordered by time.  One window pass per (Driver, LapNumber)
    partition; the same sort is reused by the gear-change lag below
    when both run in one plan."""
    w = W.partitionBy("Driver", "LapNumber").orderBy("SessionTimeSeconds")
    dt = F.col("SessionTimeSeconds") - F.lag("SessionTimeSeconds").over(w)
    # Quantize each step to 1 µm and accumulate in exact decimal: a
    # double running sum is accumulation-order-dependent (DuckDB's
    # window aggregate trees the sum; a repartitioned Spark plan could
    # too), so the cumulative distance would drift in the last bits.
    step = F.round(F.coalesce(F.col("Speed") / 3.6 * dt, F.lit(0.0)), 6)
    run = W.partitionBy("Driver", "LapNumber").orderBy("SessionTimeSeconds").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return tagged.withColumn(
        "Distance", F.sum(step.cast("decimal(26,6)")).over(run).cast("double")
    )


def lap_telemetry_summary(
    telemetry: DataFrame, laps: DataFrame, strategy: str = "broadcast"
) -> DataFrame:
    """A2 + A3 (f1_dataExtractor.py:262-287): one row per (Driver,
    LapNumber) with speed/RPM/throttle/brake aggregates, DRS-active
    any-sample flag (DRS ≥ 8, f1_dataExtractor.py:276), max integrated
    distance, first sample time, and gear-change count
    (``diff().fillna(0).abs().astype(bool).sum()`` ≡ count of samples
    whose gear differs from the previous sample, first sample = no
    change).

    Plan: range join (no telemetry shuffle under broadcast) → one
    shuffle on (Driver, LapNumber) serving BOTH window functions and
    the final hash aggregate — Spark reuses the exchange.
    """
    tagged = integrate_distance(range_join_telemetry(telemetry, laps, strategy))
    w = W.partitionBy("Driver", "LapNumber").orderBy("SessionTimeSeconds")
    prev_gear = F.lag("Gear").over(w)
    gear_changed = F.when(
        prev_gear.isNotNull() & (F.col("Gear") != prev_gear), 1
    ).otherwise(0)

    def exact_avg(c: str) -> Column:
        # Mean via an exact decimal sum: double partial-sum merge order
        # varies with partitioning, so a plain avg() is not
        # run-deterministic at scale; the decimal sum is, and matches
        # the DuckDB oracle bit-for-bit (repo parity convention).
        v = F.col(c).cast("double")
        return F.sum(v.cast("decimal(26,6)")).cast("double") / F.count(v)

    return (
        tagged.withColumn("gear_chg", gear_changed)
        .groupBy("Driver", "LapNumber")
        .agg(
            F.sum("gear_chg").cast("int").alias("TotalGearChanges"),
            F.min("SessionTimeSeconds").alias("TelemetryLapStartTime_seconds"),
            exact_avg("Speed").alias("AvgSpeed"),
            F.max("Speed").alias("MaxSpeed"),
            F.min("Speed").alias("MinSpeed"),
            exact_avg("RPM").alias("AvgRPM"),
            F.max("RPM").alias("MaxRPM"),
            exact_avg("Throttle").alias("AvgThrottle"),
            exact_avg("Brake").alias("AvgBrake"),
            F.max("Distance").alias("MaxDistance"),
            F.max(F.col("DRS") >= 8).alias("DRSActive"),
        )
        .orderBy("Driver", "LapNumber")
    )


def tyre_stint_summary(laps: DataFrame) -> DataFrame:
    """A1 (f1_dataExtractor.py:334-358): per (Driver, Stint) — compound
    of the earliest lap (the reference's ``Compound.iloc[0]`` in lap
    order → ``min_by`` on LapNumber, deterministic under distribution),
    start/end lap, lap count.

    Replaces the reference's nested unique()-loop group-by with one
    hash aggregate — a single shuffle on the (tiny) group keys.
    """
    return (
        laps.filter(F.col("Stint").isNotNull())
        .groupBy("Driver", F.col("Stint").alias("StintNumber"))
        .agg(
            F.min_by("Compound", "LapNumber").alias("Compound"),
            F.min("LapNumber").alias("StartLap"),
            F.max("LapNumber").alias("EndLap"),
            F.count(F.lit(1)).alias("NumLapsInStint"),
        )
        .orderBy("Driver", "StintNumber")
    )
