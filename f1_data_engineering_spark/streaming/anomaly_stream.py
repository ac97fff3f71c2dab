"""Structured Streaming twin of ``sliding_zscore_anomaly``
(operators/analytics3.py): per-user rolling z-score anomaly flags over
an events STREAM.

The batch operator's frame is ``rowsBetween(-20, -1)`` per user — a
strictly-past trailing window.  Streaming-wise that is a keyed rolling
buffer, the canonical ``applyInPandasWithState`` shape:

* state per user = the last ≤20 cent-long values (NULLs kept as a
  sentinel so the frame's ROW COUNT matches the batch ``count(*)``
  semantics — the batch mean divides by rows-in-frame, not by
  non-NULL values);
* each micro-batch processes the user's new rows in ``(ts, event_id)``
  order and scores each against the buffer BEFORE appending it — the
  exact strictly-past frame;
* the z expression is the identical IEEE-double tree the batch/oracle
  side evaluates from the same exact integers (Python floats are the
  same doubles), and the 6-dp rounding uses HALF_UP on the shortest
  decimal repr — the same semantics as Spark's ``round`` on doubles —
  so flag membership matches the batch operator bit-for-bit, not just
  approximately.

State is O(20 longs per active user) — watermark eviction is
unnecessary at that size, and keeping users forever is exactly what
the semantics require (the batch frame never expires either).  At
100 TB-of-stream scale the state store shards by user hash with the
shuffle, so per-executor state stays bounded by its user share.

Parity with the batch operator is pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.analytics3 import _ZMIN, _ZTHRESH, _ZWIN

__all__ = ["events_anomaly_stream", "stream_zscore_anomaly"]

EVENTS_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)

ANOMALY_SCHEMA = "user_id LONG, event_id LONG, n_prev LONG, zscore DOUBLE"

_STATE_SCHEMA = "vals ARRAY<LONG>"

#: in-band NULL marker inside the state array (value column was NULL);
#: far outside the cent range of any real value
_NULL_SENTINEL = -(2**62)


def events_anomaly_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source events stream with the fixed events schema."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def _round6_half_up(z: float) -> float:
    """Spark's ``round(double, 6)``: HALF_UP on the shortest decimal
    representation (Java ``BigDecimal.valueOf`` == Python ``repr``)."""
    import decimal

    return float(
        decimal.Decimal(repr(z)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _zscore_state_fn(key, pdfs, state):
    """applyInPandasWithState body: score each event against the
    trailing ≤20-value buffer, then append it (strictly-past frame)."""
    import decimal

    import pandas as pd

    vals = list(state.get[0]) if state.exists else []
    out_user, out_event, out_nprev, out_z = [], [], [], []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        for ev_id, value in zip(pdf["event_id"], pdf["value"]):
            n = len(vals)
            live = [v for v in vals if v != _NULL_SENTINEL]
            s = sum(live)
            ss = sum(v * v for v in live)
            if value is not None and not pd.isna(value):
                # exact Spark round(value*100, 0): HALF_UP on the
                # shortest decimal repr of the double product
                vc = int(
                    decimal.Decimal(repr(float(value) * 100)).quantize(
                        decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP
                    )
                )
            else:
                vc = None
            if vc is not None and n >= _ZMIN and n * ss > s * s:
                z = (float(vc) - float(s) / float(n)) / (
                    ((float(ss) - float(s) * float(s) / float(n)) / (float(n) - 1.0))
                    ** 0.5
                )
                zr = _round6_half_up(z)
                if abs(zr) > _ZTHRESH:
                    out_user.append(key[0])
                    out_event.append(int(ev_id))
                    out_nprev.append(n)
                    out_z.append(zr)
            vals.append(vc if vc is not None else _NULL_SENTINEL)
            if len(vals) > _ZWIN:
                vals = vals[-_ZWIN:]
    state.update((vals,))
    if out_user:
        yield pd.DataFrame(
            {
                "user_id": out_user,
                "event_id": out_event,
                "n_prev": out_nprev,
                "zscore": out_z,
            }
        )


def stream_zscore_anomaly(stream: DataFrame) -> DataFrame:
    """Rolling per-user anomaly flags over the stream — batch-parity
    output schema (user_id, event_id, n_prev, zscore)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        _zscore_state_fn,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
