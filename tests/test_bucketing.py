"""Bucketed co-located join: the lineitem ⋈ orders shuffle disappears
when both sides are bucketed on the join key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_spark.plans import count_exchanges, physical_plan
from f1_data_engineering_spark.sources.bucketed import write_bucketed
from f1_data_engineering_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # default spark-warehouse (the warehouse dir is a static conf);
    # tables are dropped on teardown
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", "l_orderkey", n_buckets=4)
    write_bucketed(o, "o_b", "o_orderkey", n_buckets=4)
    yield "li_b", "o_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    li, o = spark.table(li_t), spark.table(o_t)
    # disable AQE + broadcast so the bucket-elided SMJ is visible in the
    # static plan (broadcast would hide the shuffle question entirely)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        assert count_exchanges(joined) == 0, physical_plan(joined, "simple")
        # and the same join on plain parquet DOES shuffle both sides
        li_p = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        o_p = load_table(spark, "/root/testdata/sf0.001", "orders")
        plain = li_p.join(o_p, li_p.l_orderkey == o_p.o_orderkey)
        assert count_exchanges(plain) >= 2
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_correct(spark, sf_dir, bucketed_tables):
    li_t, o_t = bucketed_tables
    joined = spark.table(li_t).join(
        spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert joined.count() == expected
