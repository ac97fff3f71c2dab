"""Structured Streaming surface — SURVEY.md §2.9.

The reference is batch-only ("Real-time data updates" is an
unimplemented wish-list item, reference README.md:357); the natural
streaming surface of the rebuild is the telemetry/event stream:
append-mode sources → windowed aggregates with watermarks → sinks.

Every transformation here is expressed on a generic streaming
DataFrame so the same code serves a file source (tests), Kafka
(production), or rate source (load tests).  Batch/stream parity is
tested by running the identical aggregation in both modes
(tests/test_streaming.py) — the Spark guarantee that makes a lambda
architecture unnecessary.

Scale notes:

* watermarks bound state: without one, a windowed agg on a 100 TB/day
  stream grows state forever; 10 min here mirrors telemetry latency.
* ``availableNow`` triggers give incremental batch over a growing
  directory — the idiomatic replacement for the reference's
  "re-run the extractor" refresh model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

from ..schemas import TEST_TABLES

__all__ = [
    "events_file_stream",
    "tumbling_rollup",
    "sliding_avg",
    "session_windows",
    "write_stream_to_memory",
]


def events_file_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of event rows (parquet files appearing under
    ``path``).  Schema must be declared for streaming reads; ts arrives
    as typed timestamp here (tests write µs-typed files)."""
    schema = TEST_TABLES["events"]
    return spark.readStream.schema(schema).parquet(path)


def tumbling_rollup(stream: DataFrame, window: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window count/sum per event_type — the streaming twin of
    operators/timeops.hourly_event_rollup (same output columns, so
    batch parity is assertable)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value"
        )
    )


def sliding_avg(
    stream: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window average value — the weather-trend smoother
    (streamlit_app.py:249-311) in streaming form."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("avg_value"),
        )
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "n", "avg_value")
    )


def session_windows(
    stream: DataFrame, gap: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user session windows with an inactivity gap — streaming
    stint detection (the stateful twin of
    operators/timeops.sessionize_events)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def write_stream_to_memory(df: DataFrame, name: str):
    """Run a streaming query to completion over the currently-available
    input (availableNow) into an in-memory table; returns the query
    after awaiting termination.  Complete mode so windowed aggregates
    emit their final state without requiring watermark expiry."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


STATE_SCHEMA = "n_seen LONG, sum_value DOUBLE"
COUNTER_OUTPUT = "user_id LONG, n_seen LONG, sum_value DOUBLE"


def _counter_fn(key, pdfs, state):
    """Custom stateful op: running per-user count/sum across batches.

    GroupState carries (n_seen, sum_value) between micro-batches — the
    applyInPandasWithState contract: iterate the group's Arrow batches,
    update state, yield output rows.
    """
    import pandas as pd

    n, sv = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        sv += float(pdf["value"].sum())
    state.update((n, sv))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_seen": [n], "sum_value": [round(sv, 4)]}
    )


def stateful_user_counter(stream):
    """Custom stateful streaming operator (applyInPandasWithState):
    cumulative per-user event count + value sum, state persisted in the
    state store across micro-batches.

    This is the escape hatch for operators watermark-windowed aggs
    can't express (custom eviction, cross-window state machines).
    State size is O(users) — bounded; set a timeout
    (GroupStateTimeout) for unbounded key spaces in production.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        _counter_fn,
        outputStructType=COUNTER_OUTPUT,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def write_stream_foreach_batch(df, sink_path: str):
    """foreachBatch silver sink: each micro-batch lands as parquet via
    the normal batch writer — transactional per batch, and the one
    place streaming and batch code paths share a writer."""

    def _write(batch_df, batch_id: int):
        batch_df.write.mode("append").parquet(sink_path)

    q = (
        df.writeStream.foreachBatch(_write)
        .trigger(availableNow=True)
        .option("checkpointLocation", sink_path + "_chk")
        .start()
    )
    q.awaitTermination()
    return q


def streaming_dedup(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup on event_id: keep the first arrival of
    each id, dropping replays that land within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` is the scale-correct variant:
    state for an id is evicted once the watermark passes it, so state
    size is O(ids per horizon), not O(ids ever seen) — the difference
    between a bounded state store and an unbounded one on an
    at-least-once source (Kafka replays, file re-lands).
    """
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_static_join(stream: DataFrame, customers: DataFrame) -> DataFrame:
    """Enrich the event stream with a STATIC dimension (stream-static
    join): per micro-batch, the static side behaves like any batch
    join — broadcast by Catalyst when small, no streaming state at all.

    This is the default enrichment shape at scale: dims that fit in
    memory cost nothing in state; only stream-stream joins need
    watermarked buffers.
    """
    dim = customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_nationkey").alias("nation_key"),
    )
    return stream.join(F.broadcast(dim), "user_id", "left").select(
        "event_id", "ts", "user_id", "user_name", "nation_key", "event_type", "value"
    )


def purchase_click_join(stream: DataFrame, max_gap: str = "30 minutes",
                        watermark: str = "1 hour") -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding ``max_gap`` (attribution shape).

    Both sides are watermarked and the join predicate bounds event
    time on BOTH ends — that pair of constraints is what lets Spark
    evict buffered rows and keep join state finite; an unbounded
    stream-stream equi join would buffer forever.
    """
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}")),
    ).select("purchase_id", "user_id", "purchase_ts", "purchase_value", "click_id", "click_ts")


def write_stream_append_to_memory(df: DataFrame, name: str):
    """Append-mode availableNow run into an in-memory table (for
    row-emitting streaming ops — dedup, joins — where complete mode
    doesn't apply)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


SESSION_STATE_SCHEMA = "n_seen LONG, sum_value DOUBLE"
SESSION_OUTPUT = (
    "user_id LONG, n_seen LONG, sum_value DOUBLE, closed BOOLEAN"
)

#: Idle gap after which a user's session state is evicted (ms).
SESSION_IDLE_MS = 500


def _expiring_fn(key, pdfs, state):
    """Stateful session with PROCESSING-TIME EXPIRY: accumulate per
    user; when the key goes idle past SESSION_IDLE_MS the state times
    out, a FINAL ``closed=true`` record is emitted, and the state store
    entry is dropped — bounded state over unbounded key spaces, the
    production answer to the NoTimeout variant's caveat.
    """
    import pandas as pd

    if state.hasTimedOut:
        n, sv = state.get
        state.remove()  # evict — state size stays O(active users)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_seen": [n],
                "sum_value": [round(sv, 4)],
                "closed": [True],
            }
        )
        return
    n, sv = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        sv += float(pdf["value"].sum())
    state.update((n, sv))
    state.setTimeoutDuration(SESSION_IDLE_MS)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_seen": [n],
            "sum_value": [round(sv, 4)],
            "closed": [False],
        }
    )


def stateful_session_with_expiry(stream):
    """applyInPandasWithState with ProcessingTimeTimeout: running
    per-user totals that EMIT A CLOSING RECORD and evict state when the
    user goes idle — custom session semantics no built-in window
    expresses (the close event itself is output)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        _expiring_fn,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4 arbitrary-stateful API)
# ---------------------------------------------------------------------------

TWS_OUTPUT = (
    "user_id LONG, n_seen LONG, sum_value DOUBLE, n_types LONG, top_type STRING"
)


class UserStatsProcessor(StatefulProcessor):
    """Spark 4 ``StatefulProcessor``: per-user running totals PLUS a
    per-event-type histogram, each in its own typed state variable.

    This is the successor API to ``applyInPandasWithState`` and the
    scale-relevant difference is state granularity: a ValueState row
    (n_seen, sum_value) and a MapState (event_type → n) are separate
    state-store column families, so a micro-batch that only touches the
    totals never rewrites the histogram (applyInPandasWithState
    round-trips ONE monolithic state tuple per key per batch).  With
    the RocksDB state store provider that is the difference between
    point updates and full-blob rewrites for large per-key state.

    Emitted per key per batch: totals + distinct-type count + modal
    type (deterministic argmax: max count, then lexicographically
    smallest type — same tie-break convention as the batch
    ``modal_quantity_per_flag``).
    """

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", "n_seen LONG, sum_value DOUBLE")
        self._by_type = handle.getMapState(
            "by_type", "event_type STRING", "n LONG"
        )

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        n, sv = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            sv += float(pdf["value"].fillna(0.0).sum())
            for etype, cnt in pdf["event_type"].value_counts().items():
                prev = (
                    self._by_type.getValue((etype,))[0]
                    if self._by_type.containsKey((etype,))
                    else 0
                )
                self._by_type.updateValue((etype,), (prev + int(cnt),))
        self._totals.update((n, sv))
        hist = [(k[0], v[0]) for k, v in self._by_type.iterator()]
        top = min(hist, key=lambda kv: (-kv[1], kv[0]))[0] if hist else None
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_seen": [n],
                "sum_value": [round(sv, 4)],
                "n_types": [len(hist)],
                "top_type": [top],
            }
        )

    def close(self) -> None:
        pass


def user_stats_transform_with_state(stream):
    """transformWithStateInPandas run of :class:`UserStatsProcessor`
    (update mode, no time semantics — pure key-scoped state machine).

    Environment gate: the transformWithState Python worker speaks a
    protobuf protocol to the JVM state server, so executing this
    requires ``google.protobuf`` (absent from this container — the
    test skips with a clear reason; the plan construction below is
    still exercised).  applyInPandasWithState operators above cover
    the same semantics on the protobuf-free wire protocol.
    """
    return stream.groupBy("user_id").transformWithStateInPandas(
        UserStatsProcessor(),
        outputStructType=TWS_OUTPUT,
        outputMode="update",
        timeMode="none",
    )


# ---------------------------------------------------------------------------
# streaming sketch maintenance (count-min over micro-batches)
# ---------------------------------------------------------------------------


def write_stream_countmin(stream: DataFrame, state_path: str):
    """Maintain a count-min sketch over an unbounded stream: each
    micro-batch builds its own (depth, slot, n) cell table and MERGES
    it into the persisted sketch by cell-wise addition — the defining
    sketch property, and the reason a 256-cell state can summarize
    any number of events.

    The state is a VERSIONED table (sources/versioned.py) so the merge
    is replay-idempotent: foreachBatch is at-least-once, and a
    restarted micro-batch would otherwise double-count every cell it
    touches.  The batch_id-tagged overwrite commit recognizes the
    replay in the transaction log and no-ops — the same exactly-once
    contract as write_stream_versioned, reused.  Read the sketch with
    ``read_versioned(spark, state_path)``.
    """
    from ..operators.analytics2 import cms_cells
    from ..sources.versioned import read_versioned, write_versioned

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cells = cms_cells(
            batch_df.select(F.col("user_id").cast("string").alias("k"))
        )
        try:
            prev = read_versioned(spark, state_path)
        except ValueError:  # first batch: no committed sketch yet
            prev = None
        if prev is not None:
            cells = (
                prev.unionByName(cells)
                .groupBy("depth", "slot")
                .agg(F.sum("n").alias("n"))
            )
        write_versioned(
            cells.coalesce(1), state_path, mode="overwrite", batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", state_path + "_chk")
        .trigger(availableNow=True)
        .start()
    )
