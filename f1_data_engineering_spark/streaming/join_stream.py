"""Stream-stream interval join: purchases ⋈ the same user's prior
views within an hour — the attribution shape (\"which impression led
to this conversion\") run continuously.

Batch twin: :func:`view_purchase_pairs` runs the identical expression
tree on a batch frame and is registered as an oracle-checked query
(`view_purchase_join`); the streaming leg joins two watermarked
streams derived from the same source with the same time-bound
condition, and tests pin stream == batch row-for-row.

Scale notes (the reason stream-stream beats periodic batch here):

* **State bound**: each side buffers only rows younger than its
  watermark + the join's time bound (Spark derives the eviction bound
  from the `view_ts >= buy_ts - 1h` predicate) — state is
  O(1 hour of stream), not O(history).  The equivalent batch job
  re-scans a day of events to attribute one hour.
* The join keys on ``user_id`` first (hash-partitioned exchange, same
  layout both sides), the time-range predicate prunes within the
  partition — the standard stream-stream interval-join plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

__all__ = ["view_purchase_pairs", "view_purchase_pairs_stream",
           "view_purchase_join", "ORACLE_VIEW_PURCHASE"]

#: attribution window: views at most this many seconds before the buy
ATTRIB_WINDOW_S = 3600


def _sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    v = events.filter(
        (F.col("event_type") == "view") & F.col("user_id").isNotNull()
    ).select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = events.filter(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("buy_ts"),
    )
    return v, p


def _joined(v: DataFrame, p: DataFrame) -> DataFrame:
    return (
        p.join(
            v,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("view_ts") < F.col("buy_ts"))
            & (
                F.col("view_ts")
                >= F.col("buy_ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_S} SECONDS")
            ),
        )
        .select(
            F.col("p_user").alias("user_id"),
            "purchase_id",
            "view_id",
            # exact micros then floor-div: unix_timestamp() truncates
            # EACH timestamp before subtracting, which is off by one
            # around sub-second components vs the oracle's epoch diff
            (
                (F.unix_micros("buy_ts") - F.unix_micros("view_ts"))
                / F.lit(1_000_000)
            ).cast("long").alias("lag_seconds"),
        )
    )


def view_purchase_pairs(events: DataFrame) -> DataFrame:
    """Batch form: all (purchase, prior view ≤1 h) pairs per user."""
    v, p = _sides(events)
    return _joined(v, p)


def view_purchase_pairs_stream(stream: DataFrame) -> DataFrame:
    """Streaming form: the same join over two watermarked legs of the
    stream.  The 2-hour watermarks + the time-bound condition let the
    engine evict buffered rows — bounded state, append output."""
    v, p = _sides(stream)
    return _joined(
        v.withWatermark("view_ts", "2 hours"),
        p.withWatermark("buy_ts", "2 hours"),
    )


def view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the batch twin over the events table."""
    return view_purchase_pairs(load_table(spark, sf_dir, "events")).orderBy(
        "user_id", "purchase_id", "view_id"
    )


ORACLE_VIEW_PURCHASE = f"""
SELECT p.user_id AS user_id,
  p.event_id AS purchase_id,
  v.event_id AS view_id,
  CAST((epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS BIGINT) AS lag_seconds
FROM events p JOIN events v
  ON p.user_id = v.user_id
  AND p.event_type = 'purchase' AND v.event_type = 'view'
  AND v.ts < p.ts
  AND v.ts >= p.ts - INTERVAL {ATTRIB_WINDOW_S} SECONDS
WHERE p.user_id IS NOT NULL
ORDER BY p.user_id, purchase_id, view_id
"""
