"""Streaming tests: batch/stream parity on the same input — the
windowed streaming aggregates must equal their batch twins."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_spark.sources.registry import load_table
from f1_data_engineering_spark.streaming.events import (
    events_file_stream,
    session_windows,
    tumbling_rollup,
    write_stream_to_memory,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Re-land the events table as µs-typed parquet files (two chunks,
    so the stream sees multiple files)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, sf_dir, "events")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(out)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(out)
    return out


def test_tumbling_rollup_matches_batch(spark, sf_dir, events_dir):
    stream = events_file_stream(spark, events_dir)
    assert stream.isStreaming
    write_stream_to_memory(tumbling_rollup(stream), "t_rollup")
    got = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("t_rollup").collect()
    }
    batch = load_table(spark, sf_dir, "events")
    exp = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in (
            batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(38,4)"))
                .cast("double")
                .alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("hour_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
            .collect()
        )
    }
    assert got == exp


def test_session_windows_stream(spark, events_dir):
    stream = events_file_stream(spark, events_dir)
    write_stream_to_memory(session_windows(stream, gap="1 hour"), "t_sessions")
    rows = spark.table("t_sessions").collect()
    assert len(rows) > 0
    # session invariants: start <= end, positive event counts
    for r in rows:
        assert r["session_start"] <= r["session_end"]
        assert r["n_events"] >= 1


def test_stateful_user_counter(spark, sf_dir, events_dir):
    from f1_data_engineering_spark.streaming.events import (
        stateful_user_counter,
        write_stream_to_memory,
    )

    stream = events_file_stream(spark, events_dir)
    q = (
        stateful_user_counter(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last update per user must equal the batch totals
    got_df = spark.table("t_state")
    import pyspark.sql.functions as F

    last = (
        got_df.groupBy("user_id")
        .agg(F.max("n_seen").alias("n_seen"), F.max("sum_value").alias("sum_value"))
        .collect()
    )
    batch = {
        r["user_id"]: (r["n"], round(r["s"], 4))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    got = {r["user_id"]: (r["n_seen"], round(r["sum_value"], 4)) for r in last}
    assert got.keys() == batch.keys()
    mismatch = {u for u in got if got[u][0] != batch[u][0]}
    assert not mismatch
    for u in got:
        assert abs(got[u][1] - batch[u][1]) < 1e-6


def test_foreach_batch_sink(spark, events_dir, tmp_path):
    from f1_data_engineering_spark.streaming.events import (
        write_stream_foreach_batch,
    )

    sink = str(tmp_path / "silver")
    stream = events_file_stream(spark, events_dir)
    write_stream_foreach_batch(stream.select("event_id", "user_id", "value"), sink)
    back = spark.read.parquet(sink)
    assert back.count() == 10000 or back.count() == spark.read.parquet(events_dir).count()
    assert set(back.columns) == {"event_id", "user_id", "value"}


def test_streaming_dedup_drops_replays(spark, sf_dir, tmp_path):
    """Land the same event file twice (an at-least-once replay): the
    watermarked dedup must emit each event_id exactly once."""
    from f1_data_engineering_spark.streaming.events import (
        streaming_dedup,
        write_stream_append_to_memory,
    )

    out = str(tmp_path / "replayed")
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    ev.coalesce(1).write.mode("append").parquet(out)
    ev.coalesce(1).write.mode("append").parquet(out)  # replay

    stream = events_file_stream(spark, out)
    write_stream_append_to_memory(streaming_dedup(stream), "s_dedup")
    got = spark.table("s_dedup")
    n_ids = ev.count()
    assert got.count() == n_ids
    assert got.select("event_id").distinct().count() == n_ids


def test_stream_static_join_enriches(spark, sf_dir, events_dir):
    from f1_data_engineering_spark.streaming.events import (
        stream_static_join,
        write_stream_append_to_memory,
    )

    customers = load_table(spark, sf_dir, "customer")
    stream = events_file_stream(spark, events_dir)
    write_stream_append_to_memory(
        stream_static_join(stream, customers), "s_enriched"
    )
    got = spark.table("s_enriched")
    ev = load_table(spark, sf_dir, "events")
    assert got.count() == ev.count()  # left join keeps every event
    # any user with a matching customer row is enriched
    matched = got.filter(F.col("user_name").isNotNull()).count()
    expected = (
        ev.join(
            customers.select(F.col("c_custkey").alias("user_id"), "c_name"),
            "user_id",
        ).count()
    )
    assert matched == expected


def test_purchase_click_join_matches_batch(spark, sf_dir, events_dir):
    """Stream-stream interval join equals the identical batch join."""
    from f1_data_engineering_spark.streaming.events import (
        purchase_click_join,
        write_stream_append_to_memory,
    )

    stream = events_file_stream(spark, events_dir)
    write_stream_append_to_memory(purchase_click_join(stream), "s_attrib")
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.table("s_attrib").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    exp = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("user_id") == F.col("click_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (
                F.col("click_ts")
                >= F.col("purchase_ts") - F.expr("INTERVAL 30 minutes")
            ),
        ).collect()
    }
    assert len(exp) > 0
    assert got == exp


def test_available_now_incremental_rerun_processes_only_new_files(
    spark, sf_dir, tmp_path
):
    """The incremental-batch contract: re-running the availableNow
    query with the same checkpoint after new files land must append
    ONLY the new rows — this is what replaces the reference's
    rebuild-the-whole-tree transform at 100 TB."""
    from f1_data_engineering_spark.streaming.events import (
        events_file_stream,
        write_stream_foreach_batch,
    )

    src = str(tmp_path / "land")
    sink = str(tmp_path / "silver")
    ev = load_table(spark, sf_dir, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)

    first.coalesce(1).write.mode("append").parquet(src)
    write_stream_foreach_batch(events_file_stream(spark, src), sink)
    n1 = spark.read.parquet(sink).count()
    assert n1 == first.count()

    second.coalesce(1).write.mode("append").parquet(src)
    write_stream_foreach_batch(events_file_stream(spark, src), sink)
    got = spark.read.parquet(sink)
    # total = first + second, with NO re-processing of the first files
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()


def test_stateful_expiry_emits_closing_record(spark, tmp_path):
    """ProcessingTimeTimeout: once a user goes idle, the state times
    out, a closed=true record with the final totals is emitted, and
    state is evicted."""
    import time

    from f1_data_engineering_spark.streaming import events as SE

    src = tmp_path / "expiry_src"
    src.mkdir()
    spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 7.0)], "user_id long, value double"
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "batch0"))

    stream = spark.readStream.schema("user_id long, value double").parquet(
        str(src) + "/*"
    )
    q = (
        SE.stateful_session_with_expiry(stream)
        .writeStream.format("memory")
        .queryName("expiry_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        closed = {}
        while time.time() < deadline and len(closed) < 2:
            time.sleep(1)
            closed = {
                r["user_id"]: r
                for r in spark.sql(
                    "SELECT * FROM expiry_test WHERE closed"
                ).collect()
            }
        assert set(closed) == {1, 2}, f"missing close records: {closed}"
        assert closed[1]["n_seen"] == 2 and closed[1]["sum_value"] == 15.0
        assert closed[2]["n_seen"] == 1 and closed[2]["sum_value"] == 7.0
    finally:
        q.stop()


def test_transform_with_state_plan_constructs(spark, events_dir):
    """transformWithStateInPandas plan construction (no execution):
    the analyzed streaming plan must carry the operator and the
    declared output schema regardless of the protobuf runtime gate."""
    from f1_data_engineering_spark.streaming import events as SE

    stream = events_file_stream(spark, events_dir)
    out = SE.user_stats_transform_with_state(stream)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "n_seen",
        "sum_value",
        "n_types",
        "top_type",
    ]


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeMapState:
    def __init__(self):
        self._m = {}

    def containsKey(self, k):
        return k in self._m

    def getValue(self, k):
        return self._m[k]

    def updateValue(self, k, v):
        self._m[k] = v

    def iterator(self):
        return iter(self._m.items())


class _FakeHandle:
    def getValueState(self, name, schema):
        return _FakeValueState()

    def getMapState(self, name, key_schema, value_schema):
        return _FakeMapState()


def test_transform_with_state_matches_batch(spark, sf_dir, events_dir, tmp_path):
    """UserStatsProcessor (per-user totals + type histogram) against
    the batch equivalents.

    The transformWithState Python WORKER speaks protobuf to the JVM
    state server; where ``google.protobuf`` is available the processor
    runs through the real streaming query, otherwise the identical
    processor instance is driven through an in-memory state handle
    with micro-batched input — same state machine, same assertions
    (the JVM wiring itself is covered by the plan-construction test
    above)."""
    import importlib.util

    from f1_data_engineering_spark.streaming import events as SE

    if importlib.util.find_spec("google") is None or importlib.util.find_spec(
        "google.protobuf"
    ) is None:
        ev_pdf = load_table(spark, sf_dir, "events").toPandas()
        got = {}
        for uid, pdf in ev_pdf.groupby("user_id"):
            proc = SE.UserStatsProcessor()
            proc.init(_FakeHandle())
            # two micro-batches per key: state must carry across
            half = len(pdf) // 2
            chunks = [pdf.iloc[:half], pdf.iloc[half:]]
            last = None
            for chunk in chunks:
                if len(chunk) == 0:
                    continue
                for out in proc.handleInputRows(
                    (int(uid),), iter([chunk]), None
                ):
                    last = out
            got[int(uid)] = (
                int(last["n_seen"][0]),
                round(float(last["sum_value"][0]), 4),
                int(last["n_types"][0]),
            )
        ev = load_table(spark, sf_dir, "events")
        batch = {
            r["user_id"]: (r["n"], round(r["s"], 4), r["nt"])
            for r in ev.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.coalesce("value", F.lit(0.0))).alias("s"),
                F.countDistinct("event_type").alias("nt"),
            )
            .collect()
        }
        assert got == batch
        return

    stream = events_file_stream(spark, events_dir)
    q = (
        SE.user_stats_transform_with_state(stream)
        .writeStream.format("memory")
        .queryName("tws_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_df = spark.table("tws_stats")
    last = (
        got_df.groupBy("user_id")
        .agg(
            F.max("n_seen").alias("n_seen"),
            F.max("sum_value").alias("sum_value"),
            F.max("n_types").alias("n_types"),
        )
        .collect()
    )
    ev = load_table(spark, sf_dir, "events")
    batch = {
        r["user_id"]: (r["n"], round(r["s"], 4), r["nt"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("value", F.lit(0.0))).alias("s"),
            F.countDistinct("event_type").alias("nt"),
        )
        .collect()
    }
    got = {
        r["user_id"]: (r["n_seen"], round(r["sum_value"], 4), r["n_types"])
        for r in last
    }
    assert got == batch


def test_streaming_countmin_merge_equals_batch_sketch(spark, sf_dir, events_dir, tmp_path):
    """Cell-wise merging of per-micro-batch count-min sketches must
    reproduce the batch sketch exactly (the mergeability property,
    end to end) — forced through multiple micro-batches."""
    from f1_data_engineering_spark.operators.analytics2 import countmin_sketch
    from f1_data_engineering_spark.streaming import events as SE

    state = str(tmp_path / "cms_state")
    stream = spark.readStream.schema(
        load_table(spark, sf_dir, "events").schema
    ).option("maxFilesPerTrigger", 1).parquet(events_dir)
    q = SE.write_stream_countmin(stream, state)
    q.awaitTermination()

    from f1_data_engineering_spark.sources.versioned import (
        read_versioned,
        table_history,
        write_versioned,
    )

    got = {
        (r["depth"], r["slot"]): r["n"]
        for r in read_versioned(spark, state).collect()
    }
    exp = {
        (r["depth"], r["slot"]): r["n"]
        for r in countmin_sketch(spark, sf_dir).collect()
    }
    assert got == exp

    # replay-idempotence: re-committing an already-seen batch_id must
    # not change the sketch (foreachBatch is at-least-once)
    first_bid = table_history(state)[0]["batch_id"]
    write_versioned(
        read_versioned(spark, state), state, mode="overwrite", batch_id=first_bid
    )
    again = {
        (r["depth"], r["slot"]): r["n"]
        for r in read_versioned(spark, state).collect()
    }
    assert again == exp


def test_streaming_lap_telemetry_matches_batch(spark, tmp_path):
    """Streaming J1 twin (SURVEY §2.9 stretch): the stream-static
    bucketed band join + watermark-bounded stateful lap summary must
    reproduce the batch ``lap_telemetry_summary`` exactly (ints/
    bools/extrema) or to float-sum tolerance (averages, distance —
    the batch side sums in exact decimal, the buffered numpy side in
    float64).  Telemetry is re-landed as four time-ordered chunks with
    maxFilesPerTrigger=1 so laps genuinely span micro-batches and the
    cross-batch state merge is exercised."""
    from f1_data_engineering_spark.operators import f1_fixture_queries as FX
    from f1_data_engineering_spark.operators import telemetry as TEL
    from f1_data_engineering_spark.streaming import telemetry_stream as TS

    FX._ensure_fixtures()
    telem = spark.read.parquet(os.path.join(FX.FIX_DIR, "telemetry.parquet"))
    laps = spark.read.parquet(os.path.join(FX.FIX_DIR, "laps.parquet"))

    src = tmp_path / "telem_stream"
    src.mkdir()
    lo, hi = telem.agg(
        F.min("SessionTimeSeconds"), F.max("SessionTimeSeconds")
    ).first()
    for i in range(4):
        a = lo + (hi - lo) * i / 4
        b = lo + (hi - lo) * (i + 1) / 4 + (1 if i == 3 else 0)
        telem.filter(
            (F.col("SessionTimeSeconds") >= a) & (F.col("SessionTimeSeconds") < b)
        ).coalesce(1).write.mode("append").parquet(str(src / f"chunk{i}"))

    stream = TS.telemetry_file_stream(
        spark, str(src) + "/*", max_files_per_trigger=1
    )
    out = TS.stream_lap_summary(TS.stream_lap_tag(stream, laps))
    q = (
        out.writeStream.format("memory")
        .queryName("lap_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.table("lap_stream").collect()
    assert rows
    # per lap: the completest emission (the final-state record); a
    # final=true row, when present, must agree with it
    best = {}
    for r in rows:
        k = (r["Driver"], r["LapNumber"])
        if k not in best or r["n_samples"] > best[k]["n_samples"]:
            best[k] = r
    finals = [r for r in rows if r["final"]]
    assert finals, "watermark never closed any lap"
    for r in finals:
        b = best[(r["Driver"], r["LapNumber"])]
        assert r["n_samples"] == b["n_samples"]
        assert abs(r["MaxDistance"] - b["MaxDistance"]) < 1e-9

    exp = {
        (r["Driver"], r["LapNumber"]): r
        for r in TEL.lap_telemetry_summary(telem, laps, strategy="bucket").collect()
    }
    assert set(best) == set(exp)
    for k, e in exp.items():
        g = best[k]
        assert g["TotalGearChanges"] == e["TotalGearChanges"], k
        assert g["DRSActive"] == e["DRSActive"], k
        assert g["TelemetryLapStartTime_seconds"] == e["TelemetryLapStartTime_seconds"], k
        assert g["MaxSpeed"] == e["MaxSpeed"] and g["MinSpeed"] == e["MinSpeed"], k
        assert g["MaxRPM"] == e["MaxRPM"], k
        for c in ("AvgSpeed", "AvgRPM", "AvgThrottle", "AvgBrake"):
            assert abs(g[c] - e[c]) <= 1e-9 * max(1.0, abs(e[c])), (k, c)
        assert abs(g["MaxDistance"] - e["MaxDistance"]) <= 1e-6 * max(
            1.0, abs(e["MaxDistance"])
        ), k


def test_streaming_dedup_ingest_matches_one_shot(spark, sf_dir, tmp_path):
    """Streaming corpus ingestion (foreachBatch → versioned append →
    incremental index advance): the union of per-batch near-dup pair
    outputs must equal the one-shot full-corpus computation, with
    planted cross-batch near-dups found by the later batch."""
    from f1_data_engineering_spark.operators.dedup import (
        band_keys_df,
        estimate_pairs,
        signatures_df,
    )
    from f1_data_engineering_spark.sources import versioned as V
    from f1_data_engineering_spark.sources.registry import load_table
    from f1_data_engineering_spark.streaming import dedup_stream as DS

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    near = (
        docs.filter("doc_id % 3 = 0").filter("doc_id < 15")
        .withColumn("doc_id", F.col("doc_id") + 1000000)
        .withColumn(
            "text",
            F.col("text").substr(F.lit(1), ((F.length("text") * 4) / 5).cast("int")),
        )
    )
    src = tmp_path / "doc_stream"
    src.mkdir()
    # three drops; the third carries near-dups of FIRST-drop docs, so
    # cross-batch pairs only exist if the index genuinely accumulates
    docs.filter("doc_id % 3 = 0").coalesce(1).write.parquet(str(src / "drop0"))
    docs.filter("doc_id % 3 != 0").coalesce(1).write.parquet(str(src / "drop1"))
    near.coalesce(1).write.parquet(str(src / "drop2"))

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "sig_index")
    pairs_out = str(tmp_path / "pairs")
    stream = DS.document_file_stream(spark, str(src) + "/*", max_files_per_trigger=1)
    DS.write_stream_dedup_ingest(
        stream, corpus, index, pairs_out, str(tmp_path / "ckpt")
    )

    got = {
        (r["d1"], r["d2"], r["est_jaccard"])
        for r in spark.read.parquet(pairs_out).collect()
    }
    # one-shot reference over the final corpus
    full_docs = V.read_versioned(spark, corpus).select("doc_id", "text")
    sig = signatures_df(full_docs).cache()
    bands = band_keys_df(sig)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    exp = {
        (r["d1"], r["d2"], r["est_jaccard"])
        for r in estimate_pairs(cand, sig)
        .filter(F.col("est_jaccard") >= 0.5)
        .collect()
    }
    assert got == exp
    planted = {p for p in got if p[1] >= 1000000}
    assert len(planted) >= 4  # cross-batch near-dups surfaced


def test_streaming_zscore_anomaly_matches_batch(spark, tmp_path):
    """Streaming twin of sliding_zscore_anomaly: the keyed rolling
    buffer (applyInPandasWithState) must reproduce the batch trailing-
    frame operator's flag set EXACTLY — same (user_id, event_id,
    n_prev) membership and bit-equal z-scores (both sides evaluate the
    identical IEEE-double tree over the same exact cent-longs).
    Events are re-landed as four time-ordered chunks with
    maxFilesPerTrigger=1 so user histories genuinely span
    micro-batches and the cross-batch buffer carry-over is what is
    being tested."""
    from f1_data_engineering_spark.operators import analytics3 as A3
    from f1_data_engineering_spark.streaming import anomaly_stream as AS

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))

    src = tmp_path / "ev_stream"
    src.mkdir()
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    bounds = [lo + (hi - lo) * i / 4 for i in range(5)]
    for i in range(4):
        cond = (F.col("ts") >= bounds[i]) & (
            (F.col("ts") < bounds[i + 1]) if i < 3 else F.lit(True)
        )
        ev.filter(cond).coalesce(1).write.mode("append").parquet(
            str(src / f"chunk{i}")
        )

    stream = AS.events_anomaly_stream(spark, str(src) + "/*", max_files_per_trigger=1)
    q = (
        AS.stream_zscore_anomaly(stream)
        .writeStream.format("memory")
        .queryName("zscore_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "zckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["user_id"], r["event_id"]): r
        for r in spark.table("zscore_stream").collect()
    }
    exp = {
        (r["user_id"], r["event_id"]): r
        for r in A3.sliding_zscore_anomaly(spark, sf_dir).collect()
    }
    assert exp, "batch operator flagged nothing at sf0.001 — test is vacuous"
    assert set(got) == set(exp)
    for k, e in exp.items():
        assert got[k]["n_prev"] == e["n_prev"], k
        assert got[k]["zscore"] == e["zscore"], (k, got[k]["zscore"], e["zscore"])


def test_streaming_zscore_anomaly_recovers_from_checkpoint(spark, tmp_path):
    """Restart semantics: stop the anomaly stream after the first half
    of the data, start a NEW query on the same checkpoint for the rest
    — the rolling per-user buffers must recover from the state store,
    and the union of both runs' outputs must equal the batch operator
    exactly.  (A state-recovery bug would mis-score every event whose
    trailing window straddles the restart.)"""
    from f1_data_engineering_spark.operators import analytics3 as A3
    from f1_data_engineering_spark.streaming import anomaly_stream as AS

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2

    src = tmp_path / "ev_restart"
    src.mkdir()
    out_dir = str(tmp_path / "anomalies_out")
    ckpt = str(tmp_path / "restart_ckpt")

    def run_once():
        stream = AS.events_anomaly_stream(
            spark, str(src) + "/*", max_files_per_trigger=1
        )
        q = (
            AS.stream_zscore_anomaly(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: first half only
    ev.filter(F.col("ts") < mid).coalesce(1).write.mode("append").parquet(
        str(src / "half1")
    )
    run_once()
    n_first = spark.read.parquet(out_dir).count()

    # run 2: a brand-new query instance picks up the checkpoint and the
    # second half
    ev.filter(F.col("ts") >= mid).coalesce(1).write.mode("append").parquet(
        str(src / "half2")
    )
    run_once()

    got = {
        (r["user_id"], r["event_id"]): r
        for r in spark.read.parquet(out_dir).collect()
    }
    exp = {
        (r["user_id"], r["event_id"]): r
        for r in A3.sliding_zscore_anomaly(spark, sf_dir).collect()
    }
    assert set(got) == set(exp)
    for k, e in exp.items():
        assert got[k]["n_prev"] == e["n_prev"], k
        assert got[k]["zscore"] == e["zscore"], k
    # the restart actually mattered: both runs contributed output, and
    # at least one flag was scored against a buffer recovered across it
    assert 0 < n_first < len(got)
