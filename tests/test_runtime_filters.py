"""Runtime bloom-filter join pruning: Spark injects a bloom filter
built from the selective (dim) side of a shuffle join into the fact
side's scan stage, so fact rows that cannot match are dropped BEFORE
the shuffle — at 100 TB this is the difference between shuffling the
whole fact table and shuffling the ~matching slice.

The feature (spark.sql.optimizer.runtime.bloomFilter.enabled, default
true since 3.5) only fires above size thresholds tuned for clusters;
the test lowers them to observe the mechanism on test data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_spark.sources.registry import load_table


@pytest.fixture()
def runtime_filter_confs(spark):
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # AQE off so the pre-execution plan shows the final join shape
        "spark.sql.adaptive.enabled": "false",
    }
    old = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        spark.conf.set(k, v)


def test_bloom_filter_injected_on_fact_side(runtime_filter_confs, sf_dir):
    spark = runtime_filter_confs
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"  # selective creation side
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_extendedprice", "o_orderpriority"
    )
    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in plan or "BloomFilter" in plan or "might_contain" in plan, (
        plan[:3000]
    )
    # the filter must sit on the LINEITEM (application) side
    physical = joined._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in physical, physical[:3000]


def test_bloom_filter_result_unchanged(runtime_filter_confs, sf_dir):
    """Pruning is transparent: same result with the feature on or off."""
    spark = runtime_filter_confs
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    n_on = joined.count()
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    n_off = joined.count()
    assert n_on == n_off > 0
