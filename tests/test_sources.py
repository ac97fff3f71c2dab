"""Scan-layer tests: CSV null-token parity (S7), typed CSV, partitioned
parquet round-trip (S4/S5/S9)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from f1_data_engineering_spark.sources.csvio import (
    NULL_TOKENS,
    read_csv_all_string,
)
from f1_data_engineering_spark.sources.parquetio import (
    list_partitions,
    sanitize_path_component,
    write_partitioned,
)


def test_null_tokens_reference_exact(spark, tmp_path):
    """The reference's na_values list is case-sensitive: 'NaN' nulls,
    'NAN'/'?'/'NONE'/'Nat' survive (f1_dataTransformer.py:132-134)."""
    p = tmp_path / "t.csv"
    rows = ["a,b", "NaN,keep", "?,None", "NONE,Nat", ",#N/A N/A"]
    p.write_text("\n".join(rows) + "\n")
    df = read_csv_all_string(spark, str(p))
    got = [(r["a"], r["b"]) for r in df.orderBy(F.col("b").asc_nulls_first()).collect()]
    assert sorted(got, key=lambda t: (t[0] is None, str(t))) == sorted(
        [
            (None, "keep"),      # 'NaN' nulled
            ("?", None),         # '?' survives; 'None' nulled
            ("NONE", "Nat"),     # case-sensitive: both survive
            (None, None),        # '' and '#N/A N/A' nulled
        ],
        key=lambda t: (t[0] is None, str(t)),
    )
    assert "?" not in NULL_TOKENS and "#N/A N/A" in NULL_TOKENS


def test_partitioned_roundtrip(spark, tmp_path):
    """S4/S5/S9: partitioned write → pruned read → catalog browse."""
    out = os.path.join(str(tmp_path), "laps")
    df = spark.createDataFrame(
        [
            (2024, "Bahrain Grand Prix", "R", "VER", 1),
            (2024, "Bahrain Grand Prix", "Q", "VER", 1),
            (2023, "Monaco/GP", "R", "LEC", 2),
        ],
        schema="Year int, EventName string, SessionKey string, Driver string, LapNumber int",
    ).withColumn("EventName", sanitize_path_component("EventName"))
    write_partitioned(df, out)
    back = spark.read.parquet(out)
    assert back.count() == 3
    # F19 sanitization reached the directory layout
    years = {r["EventName"] for r in back.select("EventName").distinct().collect()}
    assert years == {"Bahrain_Grand_Prix", "Monaco_GP"}
    parts = list_partitions(spark, out).collect()
    assert len(parts) == 3
    # partition pruning: one session's read touches one leaf
    one = back.filter(
        (F.col("Year") == 2024) & (F.col("SessionKey") == "R")
    )
    assert one.count() == 1
    plan = one.explain(extended=False) or ""
    # (explain prints to stdout; the correctness assertion above is the gate)


def test_dynamic_partition_overwrite(spark, tmp_path):
    """Re-ingesting one session must not clobber sibling partitions."""
    out = os.path.join(str(tmp_path), "t")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, schema="Year int, EventName string, SessionKey string, v int"
    )
    write_partitioned(mk([(2024, "A", "R", 1), (2024, "B", "R", 2)]), out)
    # overwrite only (2024, A, R)
    write_partitioned(mk([(2024, "A", "R", 99)]), out)
    got = {
        (r["EventName"], r["v"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {("A", 99), ("B", 2)}


def test_read_csv_inferred(spark, tmp_path):
    """S8: header + inferSchema scan (dashboard-style)."""
    from f1_data_engineering_spark.sources.csvio import read_csv_inferred

    p = tmp_path / "t.csv"
    p.write_text("a,b,c\n1,2.5,x\n2,3.5,y\n")
    df = read_csv_inferred(spark, str(p))
    assert dict(df.dtypes) == {"a": "int", "b": "double", "c": "string"}
    assert df.count() == 2


def test_schema_evolution_merge_and_union(spark, tmp_path):
    """Old files must gain new columns as NULL under a mergeSchema
    read, and unionByName(allowMissingColumns) must align drifted
    frames by name, never position."""
    from f1_data_engineering_spark.sources.parquetio import (
        read_evolved,
        union_evolved,
    )
    from pyspark.sql import functions as F

    base = str(tmp_path / "evolved")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    # v2 adds a column AND reorders the shared ones
    v2 = spark.createDataFrame(
        [("b", 2, 9.5)], "name string, id long, score double"
    )
    v1.write.parquet(base + "/v1")
    v2.write.parquet(base + "/v2")

    merged = read_evolved(spark, base + "/*")
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None  # old file: evolved column is NULL
    assert rows[2]["score"] == 9.5

    u = union_evolved(v1, v2)
    got = {r["id"]: (r["name"], r["score"]) for r in u.collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}  # by-name, not position


def test_text_and_binaryfile_sources(spark, tmp_path):
    """The remaining built-in boundaries: line-oriented text (raw
    corpus landing) and binaryFile (media blob landing — path/len/
    bytes, the input to operators/multimodal)."""
    p = tmp_path / "raw.txt"
    p.write_text("alpha beta\ngamma\n")
    t = spark.read.text(str(p))
    assert [r["value"] for r in t.collect()] == ["alpha beta", "gamma"]

    blob = tmp_path / "img.bin"
    blob.write_bytes(b"\x89PNG_fake_payload")
    b = spark.read.format("binaryFile").load(str(blob))
    row = b.collect()[0]
    assert row["length"] == 17
    assert bytes(row["content"]) == b"\x89PNG_fake_payload"
    assert row["path"].endswith("img.bin")


def test_nano_sniff_magnitude_and_mtime(tmp_path):
    """sources/registry._nano_cols: a RAW un-annotated INT64 column only
    takes the div-1000 nanos path when its values are nanos-magnitude,
    and the sniff cache invalidates when the file is rewritten."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from f1_data_engineering_spark.sources import registry as RG

    path = str(tmp_path / "events.parquet")
    nanos = pa.table({"ts": pa.array([1_700_000_000_000_000_000], pa.int64())})
    micros = pa.table({"ts": pa.array([1_700_000_000_000_000], pa.int64())})

    pq.write_table(nanos, path)
    assert RG._nano_cols(path, ("ts",)) == ("ts",)

    # rewrite with micros-magnitude values: the (path, mtime) cache key
    # must invalidate and the magnitude guard must reject the div-1000
    time.sleep(0.01)
    pq.write_table(micros, path)
    os.utime(path, (time.time() + 5, time.time() + 5))
    assert RG._nano_cols(path, ("ts",)) == ()

    # annotated TIMESTAMP(NANOS) stays on the nanos path regardless
    ts_nanos = pa.table(
        {"ts": pa.array([1_700_000_000_000_000_000], pa.timestamp("ns"))}
    )
    pq.write_table(ts_nanos, path)
    os.utime(path, (time.time() + 10, time.time() + 10))
    assert RG._nano_cols(path, ("ts",)) == ("ts",)
