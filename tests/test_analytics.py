"""Analytic depth operators (operators/analytics.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_engineering_spark.operators import analytics as AN
from f1_data_engineering_spark.sources.registry import load_table


def test_grouping_sets_levels(spark, sf_dir):
    """Three aggregation levels in one result; levels must be
    internally consistent (detail rows sum to their rollup)."""
    rows = AN.grouping_sets_revenue(spark, sf_dir).collect()
    detail = [r for r in rows if r["rollup_level"] == 0]
    mid = [r for r in rows if r["rollup_level"] == 1]
    total = [r for r in rows if r["rollup_level"] == 2]
    assert len(total) == 1
    assert {r["l_returnflag"] for r in mid} == {
        r["l_returnflag"] for r in detail
    }
    assert total[0]["n"] == sum(r["n"] for r in detail)
    assert abs(total[0]["revenue"] - sum(r["revenue"] for r in detail)) < 1e-3
    for m in mid:
        part = [r for r in detail if r["l_returnflag"] == m["l_returnflag"]]
        assert m["n"] == sum(r["n"] for r in part)


def test_null_safe_join_keeps_null_keys(spark, sf_dir):
    """The NULL-key groups from both sides must meet in exactly one
    row, and every row must carry at least one nonzero count."""
    rows = AN.null_safe_event_join(spark, sf_dir).collect()
    null_rows = [r for r in rows if r["is_null_key"]]
    assert len(null_rows) <= 1
    for r in rows:
        assert r["n_browse"] + r["n_convert"] > 0


def test_modal_quantity_is_argmax(spark, sf_dir):
    """Reported mode must be the true argmax of the per-group value
    histogram with the ASC-value tie-break."""
    li = load_table(spark, sf_dir, "lineitem")
    hist = (
        li.groupBy("l_returnflag", F.col("l_quantity").cast("long").alias("q"))
        .count()
        .collect()
    )
    best: dict[str, tuple[int, int]] = {}
    for r in hist:
        key = r["l_returnflag"]
        cand = (-r["count"], r["q"])
        if key not in best or cand < best[key]:
            best[key] = cand
    for r in AN.modal_quantity_per_flag(spark, sf_dir).collect():
        c, q = best[r["l_returnflag"]]
        assert (r["modal_qty"], r["cnt"]) == (q, -c)


def test_islands_partition_the_keyset(spark, sf_dir):
    """Islands must be disjoint, sorted, gap-separated, and cover
    every filtered key exactly once."""
    n_keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select("o_orderkey")
        .distinct()
        .count()
    )
    rows = AN.orderkey_islands(spark, sf_dir).collect()
    assert sum(r["n_keys"] for r in rows) == n_keys
    prev_end = None
    for r in rows:
        assert r["island_start"] <= r["island_end"]
        assert r["span"] >= r["n_keys"]
        if prev_end is not None:
            assert r["island_start"] > prev_end + 1  # true gap between islands
        prev_end = r["island_end"]


def test_islands_bucket_boundary_merge(spark):
    """A run crossing the bucket boundary must come back as ONE island
    (the phase-2 merge), exercised with a synthetic key set."""
    import f1_data_engineering_spark.operators.analytics as A

    b = A.ISLAND_BUCKET
    keys = [b - 2, b - 1, b, b + 1, b + 5, 3 * b + 7]
    df = spark.createDataFrame([(k,) for k in keys], "o_orderkey long").withColumn(
        "o_totalprice", F.lit(200000.0)
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(os.path.join(td, "orders.parquet"))
        rows = A.orderkey_islands(spark, td).collect()
    spans = [(r["island_start"], r["island_end"], r["n_keys"]) for r in rows]
    assert spans == [(b - 2, b + 1, 4), (b + 5, b + 5, 1), (3 * b + 7, 3 * b + 7, 1)]


def test_daily_spine_covers_every_day(spark, sf_dir):
    """Spine must be gapless (one row per calendar day), preserve
    zero-order days, and the rolling sum must equal the trailing-7
    window recomputed in pandas."""
    rows = AN.daily_order_spine(spark, sf_dir).collect()
    days = [r["d"] for r in rows]
    assert len(days) == (max(days) - min(days)).days + 1
    assert len(set(days)) == len(days)
    assert any(r["n_orders"] == 0 for r in rows)  # gap-fill proven
    n = [r["n_orders"] for r in rows]
    for i in (0, 3, 100, len(rows) - 1):
        lo = max(0, i - 6)
        assert rows[i]["r7_orders"] == sum(n[lo : i + 1])
