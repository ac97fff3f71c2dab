"""Profiling / sampling / sketch operators (operators/profiling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_engineering_spark.operators import profiling as PF
from f1_data_engineering_spark.sources.registry import load_table


def test_profile_covers_every_column_once(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    rows = {r["col_name"]: r for r in PF.profile_orders(spark, sf_dir).collect()}
    assert set(rows) == set(o.columns)
    n = o.count()
    for r in rows.values():
        assert r["n_rows"] == n
        assert 0 <= r["n_nulls"] <= n
        assert 1 <= r["n_distinct"] <= n
    # numeric column carries min/max, string column carries lengths
    assert rows["o_totalprice"]["min_num"] <= rows["o_totalprice"]["max_num"]
    assert rows["o_totalprice"]["min_len"] is None
    assert rows["o_orderstatus"]["min_num"] is None
    assert rows["o_orderstatus"]["min_len"] >= 1


def test_profile_null_and_distinct_counts_exact(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    rows = {r["col_name"]: r for r in PF.profile_orders(spark, sf_dir).collect()}
    exact_nulls = o.filter(F.col("o_custkey").isNull()).count()
    exact_distinct = o.select("o_custkey").na.drop().distinct().count()
    assert rows["o_custkey"]["n_nulls"] == exact_nulls
    assert rows["o_custkey"]["n_distinct"] == exact_distinct


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    s = PF.stratified_sample_orders(spark, sf_dir)
    got = {
        r["o_orderstatus"]: r["n"]
        for r in s.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    tot = {
        r["o_orderstatus"]: r["n"]
        for r in o.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    for status, pct in PF.STRATA_RATES.items():
        # md5 is uniform: observed rate within ±5 points of nominal
        assert abs(got.get(status, 0) / tot[status] * 100 - pct) < 5, status
    # determinism: same rows on re-execution (no rand() anywhere)
    a = sorted(r["o_orderkey"] for r in s.collect())
    b = sorted(r["o_orderkey"] for r in PF.stratified_sample_orders(spark, sf_dir).collect())
    assert a == b


def test_sketch_summary_error_bounds(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sk = {r["event_type"]: r for r in PF.sketch_summary(spark, sf_dir).collect()}
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    # second engine: the same exact aggregates from DuckDB — the sketch
    # estimates must satisfy the error bound against BOTH engines'
    # ground truth, and the two ground truths must agree exactly
    import duckdb

    duck = {
        et: (int(users), n)
        for et, users, n in duckdb.sql(
            f"SELECT event_type, COUNT(DISTINCT user_id), COUNT(*) "
            f"FROM '{sf_dir}/events.parquet' GROUP BY event_type"
        ).fetchall()
    }
    assert set(sk) == set(exact) == set(duck)
    for et, e in exact.items():
        s = sk[et]
        assert s["n"] == e["n"] == duck[et][1]  # plain count rides along exactly
        assert e["users"] == duck[et][0], et  # engines agree on ground truth
        # HLL++ rsd=0.05 ⇒ 3σ = 15%
        assert abs(s["approx_users"] - e["users"]) <= max(3, 0.15 * e["users"]), et
        # approx_percentile(accuracy=10000) on n ≪ 10000 rows is exact-ish
        lo, hi = (
            ev.filter(F.col("event_type") == et)
            .agg(F.min("value"), F.max("value"))
            .first()
        )
        assert lo <= s["p50"] <= hi
        assert s["p50"] <= s["p95"] <= s["p99"] <= hi


def test_corr_matrix_matches_numpy(spark, sf_dir):
    """Exact-decimal-moment correlations must agree with numpy's
    two-pass computation to float tolerance, and the matrix must
    cover every column pair exactly once."""
    import itertools

    import numpy as np

    rows = PF.numeric_corr_matrix(spark, sf_dir).collect()
    pairs = {(r["col_x"], r["col_y"]): r for r in rows}
    assert set(pairs) == set(itertools.combinations(PF.CORR_COLS, 2))
    pdf = (
        load_table(spark, sf_dir, "lineitem")
        .select(*PF.CORR_COLS)
        .toPandas()
    )
    for (x, y), r in pairs.items():
        assert r["n"] == len(pdf)
        expected = np.corrcoef(pdf[x], pdf[y])[0, 1]
        assert abs(r["corr_r"] - expected) < 1e-5
        assert -1.0 <= r["corr_r"] <= 1.0
        expected_cov = np.cov(pdf[x], pdf[y], bias=True)[0, 1]
        assert abs(r["cov_pop_r"] - expected_cov) < max(1e-4, abs(expected_cov) * 1e-6)
