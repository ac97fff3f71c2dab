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


def test_sketch_summary_matches_python_references(spark, sf_dir):
    """hll_users must equal a pure-Python raw HLL (registers AND
    estimate — the value contract behind the r7 oracle), quantiles the
    numpy linear-interpolated percentiles, counts exact."""
    import hashlib

    import numpy as np
    import pandas as pd

    from f1_data_engineering_spark.operators import analytics4 as A4

    sk = {r["event_type"]: r for r in PF.sketch_summary(spark, sf_dir).collect()}
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["event_type", "user_id", "value"]
    ]
    groups = dict(tuple(pdf.groupby("event_type", dropna=False)))
    assert set(sk) == {
        (None if pd.isna(k) else k) for k in groups
    }
    for et, grp in groups.items():
        s = sk[None if pd.isna(et) else et]
        assert s["n"] == len(grp)
        # raw 2007 HLL with the repo's 60-bit md5 scheme (no
        # small-range correction — value parity, not an accuracy bound:
        # tiny groups sit at the known n≪m plateau by contract)
        regs: dict[int, int] = {}
        for u in grp.user_id.dropna():
            h = int(hashlib.md5(f"hll#{int(u)}".encode()).hexdigest()[:15], 16)
            b, w = h % A4.HLL_M, h // A4.HLL_M
            rho = (A4.HLL_RHO_BITS + 1) if w == 0 else (
                A4.HLL_RHO_BITS + 1 - w.bit_length()
            )
            regs[b] = max(regs.get(b, 0), rho)
        est = float(A4.HLL_M - len(regs))
        for b in sorted(regs):
            est += 1.0 / float(1 << regs[b])
        est = A4.HLL_ALPHA * A4.HLL_M * A4.HLL_M / est
        assert s["n_buckets_used"] == len(regs), et
        assert abs(s["hll_users"] - round(est, 6)) < 1e-9, et
        # exact interpolated quantiles vs numpy (same lerp definition)
        vals = grp.value.dropna().to_numpy(dtype=float)
        for col, q in (("p50", 50), ("p95", 95), ("p99", 99)):
            assert abs(s[col] - np.percentile(vals, q)) < 1e-6, (et, col)
        assert s["p50"] <= s["p95"] <= s["p99"]


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
