"""ORC boundary (sources/orcio.py): schema-asserted roundtrip,
partitioned dynamic overwrite, pushdown reaches the ORC scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_engineering_spark.sources.orcio import read_orc, write_orc_partitioned
from f1_data_engineering_spark.sources.registry import load_table
from f1_data_engineering_spark.plans import physical_plan


def test_orc_roundtrip_partitioned(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "etype", F.col("event_type")
    )
    path = str(tmp_path / "events_orc")
    write_orc_partitioned(ev, path, partition_cols=("etype",))
    back = read_orc(
        spark,
        path,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    assert back.count() == ev.count()
    # values survive the roundtrip (sum over a double column)
    a = ev.agg(F.sum("value")).first()[0]
    b = back.agg(F.sum("value")).first()[0]
    assert abs(a - b) < 1e-6
    # partition pruning: a filter on the partition column reads one dir
    one = back.filter(F.col("etype") == "click")
    assert one.count() == ev.filter(F.col("event_type") == "click").count()


def test_orc_dynamic_overwrite_replaces_only_touched_partition(
    spark, sf_dir, tmp_path
):
    ev = load_table(spark, sf_dir, "events").withColumn("etype", F.col("event_type"))
    path = str(tmp_path / "events_orc_dyn")
    write_orc_partitioned(ev, path, partition_cols=("etype",))
    total = ev.count()
    # rewrite ONE partition with a single marker row
    one = ev.filter(F.col("event_type") == "click").limit(1)
    n_click = ev.filter(F.col("event_type") == "click").count()
    write_orc_partitioned(one, path, partition_cols=("etype",))
    back = read_orc(
        spark,
        path,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    assert back.count() == total - n_click + 1


def test_orc_filter_pushdown_in_plan(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_orc_flat")
    write_orc_partitioned(ev, path)
    back = read_orc(
        spark,
        path,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).filter(F.col("user_id") > 100)
    plan = physical_plan(back, "formatted")
    assert "PushedFilters" in plan and "GreaterThan(user_id,100)" in plan, plan[:1500]
