"""Round-11 optimization internals: metadata arithmetic must equal the
scans it replaced.

* ``versioned.log_column_bounds`` — z-order bounds from the commit
  log's per-file stats must equal the scan-derived min/max on a table
  without deletion vectors, and must refuse (None) when stats are
  incomplete for a requested column, so callers fall back to the scan.
* ``registry.table_row_count`` — footer row counts must equal
  ``df.count()`` for every test table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from f1_data_engineering_spark.sources import versioned as V
from f1_data_engineering_spark.sources.registry import (
    TEST_TABLE_NAMES,
    load_table,
    table_row_count,
)


def test_log_column_bounds_match_scan(spark, sf_dir, tmp_path):
    t = str(tmp_path / "lake")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    V.write_versioned(orders.repartition(4, "o_totalprice"), t, mode="overwrite")
    V.write_versioned(
        orders.filter("o_orderkey % 7 = 0").select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "o_custkey",
            "o_totalprice",
        ),
        t,
        mode="append",
    )
    lb = V.log_column_bounds(t, ("o_orderkey", "o_custkey"))
    assert lb is not None
    scan = V.read_versioned(spark, t).agg(
        F.min("o_orderkey"), F.max("o_orderkey"),
        F.min("o_custkey"), F.max("o_custkey"),
    ).first()
    assert lb["o_orderkey"] == (scan[0], scan[1])
    assert lb["o_custkey"] == (scan[2], scan[3])


def test_log_column_bounds_refuses_incomplete_stats(spark, tmp_path):
    t = str(tmp_path / "lake_null")
    df = spark.createDataFrame(
        [(1, None), (2, None)], "k long, all_null long"
    )
    V.write_versioned(df, t, mode="overwrite")
    # all-NULL column carries no parquet stats → None, caller must scan
    assert V.log_column_bounds(t, ("k", "all_null")) is None
    # string columns are excluded from the numeric contract only when
    # stats are absent/non-numeric; a plain numeric column still works
    assert V.log_column_bounds(t, ("k",)) == {"k": (1, 2)}


@pytest.mark.parametrize("name", TEST_TABLE_NAMES)
def test_table_row_count_matches_count(spark, sf_dir, name):
    assert table_row_count(sf_dir, name) == load_table(
        spark, sf_dir, name
    ).count()


def test_delta_row_count_matches_delta_read(spark, tmp_path):
    t = str(tmp_path / "lake_delta")
    a = spark.createDataFrame([(i, i * 10) for i in range(7)], "k long, v long")
    b = spark.createDataFrame([(i, i) for i in range(7, 12)], "k long, v long")
    V.write_versioned(a, t, mode="append")
    V.write_versioned(b, t, mode="append")
    head = V.latest_version(t)
    # append-only range: arithmetic count ≡ the delta read's count
    assert V.delta_row_count(t, -1, head) == V.read_version_delta(
        spark, t, -1, head
    ).count() == 12
    assert V.delta_row_count(t, 0, head) == 5
    # empty range
    assert V.delta_row_count(t, head, head) == 0
    # nonexistent head → None (read_version_delta raises; callers fall
    # back to the read and get its clearer error)
    assert V.delta_row_count(t, 0, head + 5) is None


def test_delta_row_count_refuses_non_append(spark, tmp_path):
    from f1_data_engineering_spark.sources import dml as D

    t = str(tmp_path / "lake_delta_dml")
    a = spark.createDataFrame([(i, i) for i in range(10)], "k long, v long")
    V.write_versioned(a, t, mode="append")
    D.delete_where(spark, t, "k % 2 = 0")
    head = V.latest_version(t)
    # the rewrite commit invalidates append arithmetic → None
    assert V.delta_row_count(t, -1, head) is None
