"""Spark 4 SQL-surface capabilities: SQL UDFs, pipe syntax, collations.

These pin engine features a reference user migrating to this repo can
rely on — each with domain-shaped usage, not synthetic toys.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_sql_udf_drs_active(spark):
    """The reference's DRS rule (value >= 8 means active,
    f1_dataExtractor.py:276) as a catalog-level SQL function: pure SQL
    body, fully optimizable (inlined by Catalyst — no Python hop)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION drs_active(x INT) "
        "RETURNS BOOLEAN RETURN x IS NOT NULL AND x >= 8"
    )
    rows = spark.sql(
        "SELECT x, drs_active(x) AS act FROM VALUES (0), (8), (12), (NULL) t(x)"
    ).collect()
    got = {r["x"]: r["act"] for r in rows}
    assert got == {0: False, 8: True, 12: True, None: False}


def test_sql_udf_lap_time_format(spark):
    """A SQL UDF can wrap the engine's formatting convention so SQL
    users get MM:SS:mmm without Python: 81.5 -> 01:21:500."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION fmt_mmssms_sql(s DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN s IS NULL OR isnan(s) THEN NULL ELSE "
        "concat(CASE WHEN s < 0 THEN '-' ELSE '' END, "
        "format_string('%02d:%02d:%03d', "
        "  CAST(bround(abs(s) * 1000, 0) AS BIGINT) DIV 60000, "
        "  CAST(bround(abs(s) * 1000, 0) AS BIGINT) % 60000 DIV 1000, "
        "  CAST(bround(abs(s) * 1000, 0) AS BIGINT) % 1000)) END"
    )
    rows = spark.sql(
        "SELECT s, fmt_mmssms_sql(s) AS f "
        "FROM VALUES (81.5D), (-0.0004D), (3665.123D), (CAST('NaN' AS DOUBLE)) t(s)"
    ).collect()
    got = {repr(r["s"]): r["f"] for r in rows}
    assert got[repr(81.5)] == "01:21:500"
    assert got[repr(-0.0004)] == "-00:00:000"  # sign split before magnitude
    assert got[repr(3665.123)] == "61:05:123"  # minutes uncapped
    assert got[repr(float("nan"))] is None

    # must agree with the expression library on the same vectors
    from f1_data_engineering_spark.functions.timefmt import fmt_mmssms

    df = spark.createDataFrame([(81.5,), (-0.0004,), (3665.123,)], "s double")
    lib = [r[0] for r in df.select(fmt_mmssms("s")).collect()]
    assert lib == ["01:21:500", "-00:00:000", "61:05:123"]


def test_pipe_syntax_query(spark, sf_dir):
    """SQL pipe syntax (|>): the Q6 shape reads top-to-bottom; result
    must match the classic formulation exactly."""
    from f1_data_engineering_spark.sources.registry import load_table

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("pipe_li")
    piped = spark.sql(
        """
        FROM pipe_li
        |> WHERE l_shipdate >= TIMESTAMP '1994-01-01'
           AND l_shipdate < TIMESTAMP '1995-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |> AGGREGATE CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
             AS revenue, COUNT(*) AS n
        """
    ).collect()[0]
    classic = spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
                 AS revenue, COUNT(*) AS n
        FROM pipe_li
        WHERE l_shipdate >= TIMESTAMP '1994-01-01'
          AND l_shipdate < TIMESTAMP '1995-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        """
    ).collect()[0]
    assert piped == classic


def test_collated_case_insensitive_join(spark):
    """UTF8_LCASE collation: driver codes join case-insensitively
    WITHOUT lower() wrappers — the collation is part of the type, so
    it survives into the join keys."""
    a = spark.createDataFrame([("VER",), ("lec",)], "code string").select(
        F.col("code").cast("string collate UTF8_LCASE").alias("code")
    )
    b = spark.createDataFrame(
        [("ver", 1), ("LEC", 2), ("HAM", 3)], "code string, x int"
    ).select(
        F.col("code").cast("string collate UTF8_LCASE").alias("code"), "x"
    )
    got = sorted(r["x"] for r in a.join(b, "code").collect())
    assert got == [1, 2]
    # and collated ordering groups case variants together
    s = spark.sql(
        "SELECT c FROM VALUES ('b'), ('A'), ('a'), ('B') t(c) "
        "ORDER BY c COLLATE UTF8_LCASE, c"
    ).collect()
    assert [r["c"] for r in s] == ["A", "a", "B", "b"]
