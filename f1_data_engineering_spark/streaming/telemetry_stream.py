"""Structured Streaming twin of the F1 telemetry engine (SURVEY.md
§2.9 stretch: streaming J1 + A2/A3/A6).

The batch operator (`operators/telemetry.py:lap_telemetry_summary`,
re-architecting f1_dataExtractor.py:250-302) tags each telemetry
sample with its lap via a range join, then computes order-dependent
per-lap aggregates (distance integration, gear-change lag count).
This module runs the same computation over a telemetry STREAM:

* the lap tag is a stream-static join using the BUCKETED band-join
  strategy (`telemetry.py` ``strategy='bucket'``): the static laps
  side explodes to its covering time buckets once per micro-batch,
  the stream side derives its bucket scan-side, and the join is an
  equi join on (Driver, bucket) + residual band filter — stateless,
  no stream shuffle beyond the equi key, exactly the 100 TB shape of
  the batch plan;
* the per-lap summary is a custom stateful operator
  (``applyInPandasWithState``): samples buffer in keyed state until
  the event-time watermark passes the lap (EventTimeTimeout), then
  the lap's summary is computed ONCE from the complete, time-sorted
  buffer — the standard streaming shape for order-dependent
  per-session computation.  State is watermark-bounded: a lap's
  buffer lives only until the watermark clears its last sample, so
  state size is O(laps in flight × samples per lap), not O(stream).

Each micro-batch also emits a provisional (``final=false``) row per
updated lap so downstream dashboards see live lap stats; the
``final=true`` row on timeout is the batch-parity record.  Parity
with the batch operator is pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.telemetry import DEFAULT_BUCKET_S, lap_boundaries

__all__ = [
    "telemetry_file_stream",
    "stream_lap_tag",
    "stream_lap_summary",
]

TELEMETRY_SCHEMA = (
    "Driver STRING, SessionTimeSeconds DOUBLE, Speed DOUBLE, RPM DOUBLE, "
    "Throttle DOUBLE, Brake INT, Gear INT, DRS INT"
)

#: Event-time base for mapping session seconds onto a timestamp axis —
#: watermarks need a TimestampType column; any fixed epoch works.
_EPOCH_S = 1_600_000_000


def telemetry_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source telemetry stream with an event-time column ``ts``
    derived from SessionTimeSeconds (the session clock IS the event
    time; a fixed epoch anchors it to a timestamp axis)."""
    reader = spark.readStream.schema(TELEMETRY_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path).withColumn(
        "ts", F.timestamp_seconds(F.lit(_EPOCH_S) + F.col("SessionTimeSeconds"))
    )


def stream_lap_tag(
    stream: DataFrame, laps: DataFrame, bucket_s: float = DEFAULT_BUCKET_S
) -> DataFrame:
    """J1 on a stream: tag each sample with its (Driver, LapNumber)
    via the bucketed band join against the STATIC laps table.

    Stream-static joins are stateless (each micro-batch joins like a
    batch); the bucket equi key keeps the join an equi join Catalyst
    can broadcast, with the band predicate as residual filter —
    identical to the batch ``strategy='bucket'`` plan.
    """
    lb = lap_boundaries(laps).withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("lap_start_s") / bucket_s),
                F.floor(F.col("lap_end_s") / bucket_s),
            )
        ),
    )
    tb = stream.withColumn(
        "bucket", F.floor(F.col("SessionTimeSeconds") / bucket_s)
    ).alias("t")
    band = (
        (F.col("t.SessionTimeSeconds") >= F.col("l.lap_start_s"))
        & (F.col("t.SessionTimeSeconds") < F.col("l.lap_end_s"))
        & (F.col("t.Driver") == F.col("l.Driver"))
    )
    joined = tb.join(
        F.broadcast(lb.alias("l")),
        (F.col("t.bucket") == F.col("l.bucket")) & band,
    )
    return joined.select("t.*", F.col("l.LapNumber").alias("LapNumber")).drop(
        "bucket"
    )


_STATE_SCHEMA = (
    "times ARRAY<DOUBLE>, speed ARRAY<DOUBLE>, rpm ARRAY<DOUBLE>, "
    "throttle ARRAY<DOUBLE>, brake ARRAY<DOUBLE>, gear ARRAY<DOUBLE>, "
    "drs ARRAY<DOUBLE>"
)

LAP_SUMMARY_SCHEMA = (
    "Driver STRING, LapNumber INT, TotalGearChanges INT, "
    "TelemetryLapStartTime_seconds DOUBLE, AvgSpeed DOUBLE, "
    "MaxSpeed DOUBLE, MinSpeed DOUBLE, AvgRPM DOUBLE, MaxRPM DOUBLE, "
    "AvgThrottle DOUBLE, AvgBrake DOUBLE, MaxDistance DOUBLE, "
    "DRSActive BOOLEAN, n_samples LONG, final BOOLEAN"
)


def _summarize(key, times, speed, rpm, throttle, brake, gear, drs, final):
    """Batch-identical lap summary from the buffered sample arrays —
    mirrors ``lap_telemetry_summary``'s aggregate list (time-sorted
    lag for gear changes, Δt·v/3.6 distance integration with per-step
    1 µm quantization)."""
    import numpy as np
    import pandas as pd

    order = np.argsort(np.asarray(times), kind="stable")
    t = np.asarray(times, dtype=np.float64)[order]
    sp = np.asarray(speed, dtype=np.float64)[order]
    g = np.asarray(gear, dtype=np.float64)[order]
    steps = np.round(np.diff(t, prepend=t[0]) * sp / 3.6, 6)
    steps[0] = 0.0
    dist = np.cumsum(steps)
    gear_changes = int((g[1:] != g[:-1]).sum()) if len(g) > 1 else 0
    return pd.DataFrame(
        {
            "Driver": [key[0]],
            "LapNumber": [int(key[1])],
            "TotalGearChanges": [gear_changes],
            "TelemetryLapStartTime_seconds": [float(t.min())],
            "AvgSpeed": [float(np.sum(sp) / len(sp))],
            "MaxSpeed": [float(sp.max())],
            "MinSpeed": [float(sp.min())],
            "AvgRPM": [float(np.mean(np.asarray(rpm, dtype=np.float64)))],
            "MaxRPM": [float(np.max(np.asarray(rpm, dtype=np.float64)))],
            "AvgThrottle": [float(np.mean(np.asarray(throttle, dtype=np.float64)))],
            "AvgBrake": [float(np.mean(np.asarray(brake, dtype=np.float64)))],
            "MaxDistance": [float(dist.max()) if len(dist) else 0.0],
            "DRSActive": [bool((np.asarray(drs, dtype=np.float64) >= 8).any())],
            "n_samples": [int(len(t))],
            "final": [final],
        }
    )


def _lap_state_fn(key, pdfs, state):
    """applyInPandasWithState body: buffer the lap's samples, emit a
    provisional summary per micro-batch, and the final summary when
    the watermark passes the lap (EventTimeTimeout)."""
    import pandas as pd

    if state.hasTimedOut:
        if state.exists:
            (times, speed, rpm, throttle, brake, gear, drs) = state.get
            state.remove()
            if times:
                yield _summarize(
                    key, times, speed, rpm, throttle, brake, gear, drs, True
                )
        return

    if state.exists:
        times, speed, rpm, throttle, brake, gear, drs = (
            list(a) for a in state.get
        )
    else:
        times, speed, rpm, throttle, brake, gear, drs = ([], [], [], [], [], [], [])
    for pdf in pdfs:
        times.extend(float(v) for v in pdf["SessionTimeSeconds"])
        speed.extend(float(v) for v in pdf["Speed"])
        rpm.extend(float(v) for v in pdf["RPM"])
        throttle.extend(float(v) for v in pdf["Throttle"])
        brake.extend(float(v) for v in pdf["Brake"])
        gear.extend(float(v) for v in pdf["Gear"])
        drs.extend(float(v) for v in pdf["DRS"])
    state.update((times, speed, rpm, throttle, brake, gear, drs))
    # evict once the watermark clears the lap's last seen sample (+1 s
    # slack for the sub-second tail of the last sample interval);
    # clamped above the current watermark — samples arriving near the
    # watermark horizon would otherwise request a timeout in the past,
    # which the state store rejects
    desired_ms = int((max(times) + 1) * 1000) + _EPOCH_S * 1000
    state.setTimeoutTimestamp(max(desired_ms, state.getCurrentWatermarkMs() + 1))
    yield _summarize(key, times, speed, rpm, throttle, brake, gear, drs, False)


def stream_lap_summary(
    tagged: DataFrame, watermark: str = "2 minutes"
) -> DataFrame:
    """A2+A3+A6 on the tagged stream: per-(Driver, LapNumber) summary
    with watermark-bounded buffered state (see module docstring)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        tagged.withWatermark("ts", watermark)
        .groupBy("Driver", "LapNumber")
        .applyInPandasWithState(
            _lap_state_fn,
            outputStructType=LAP_SUMMARY_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
