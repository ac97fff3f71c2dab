"""XML boundary (sources/xmlio.py)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from f1_data_engineering_spark.sources.xmlio import read_xml, write_xml

SCHEMA = T.StructType(
    [
        T.StructField("Driver", T.StringType()),
        T.StructField("LapNumber", T.IntegerType()),
        T.StructField("LapTime", T.DoubleType()),
    ]
)


def test_xml_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [("VER", 1, 81.5), ("LEC", 1, 82.25), ("VER", 2, 80.975)], SCHEMA
    )
    out = str(tmp_path / "laps_xml")
    write_xml(df.coalesce(1), out, row_tag="lap", root_tag="laps")

    back = read_xml(spark, out, "lap", SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    assert back.schema == SCHEMA  # no inference drift


def test_xml_malformed_field_nulls_not_fails(spark, tmp_path):
    p = tmp_path / "bad.xml"
    p.write_text(
        "<laps>"
        "<lap><Driver>VER</Driver><LapNumber>1</LapNumber><LapTime>81.5</LapTime></lap>"
        "<lap><Driver>LEC</Driver><LapNumber>oops</LapNumber><LapTime>82.0</LapTime></lap>"
        "</laps>"
    )
    got = read_xml(spark, str(p), "lap", SCHEMA)
    rows = {r["Driver"]: r for r in got.collect()}
    assert rows["VER"]["LapNumber"] == 1 and rows["VER"]["LapTime"] == 81.5
    # PERMISSIVE nulls the malformed ROW's typed fields (row-level, not
    # per-field) — the row SURVIVES for quarantine instead of failing
    # the scan
    assert "LEC" in rows or None in rows
    bad = rows.get("LEC") or rows[None]
    assert bad["LapNumber"] is None
