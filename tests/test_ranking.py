"""operators/ranking.py: the two scale-safe global-rank constructions
must be EXACTLY equivalent to the naive unpartitioned window."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from f1_data_engineering_spark.operators.ranking import (
    bucketed_topk_rank,
    offset_global_rank,
)


def _corpus(spark):
    # skewed counts with heavy ties — the adversarial case for both
    # the bucket prune and the offset table
    rows = [(f"t{i:04d}", (i % 7) ** 2 + i % 3) for i in range(500)]
    return spark.createDataFrame(rows, "term string, c long")


def test_bucketed_topk_rank_matches_global_window(spark):
    df = _corpus(spark)
    order = [F.col("c").desc(), F.col("term")]
    got = {
        (r["term"], r["rank"])
        for r in bucketed_topk_rank(df, order, 37, bucket_key="term").collect()
    }
    w = W.orderBy(*order)
    exp = {
        (r["term"], r["rank"])
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 37)
        .collect()
    }
    assert got == exp


def test_bucketed_topk_k_larger_than_input(spark):
    df = _corpus(spark).limit(5)
    out = bucketed_topk_rank(
        df, [F.col("c").desc(), F.col("term")], 100, bucket_key="term"
    ).collect()
    assert sorted(r["rank"] for r in out) == [1, 2, 3, 4, 5]


def test_offset_global_rank_matches_global_window(spark):
    df = _corpus(spark)
    got = {
        (r["term"], r["rank"])
        for r in offset_global_rank(
            df, "c", group_desc=True, tie_order=[F.col("term")]
        ).collect()
    }
    w = W.orderBy(F.col("c").desc(), "term")
    exp = {
        (r["term"], r["rank"])
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == exp
