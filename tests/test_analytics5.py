"""Unit/property tests for the round-6 wave: KMV set algebra, Bloom
join pruning, weighted systematic sampling, higher moments, bounded
SSSP, the DQ expectation suite, snapshot diff, and the LSH recall
audit.  (Cross-engine value parity is covered by the differential gate
— scripts/oracle_check.py — these pin the algebraic invariants.)"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from f1_data_engineering_spark.operators import analytics5 as A5
from f1_data_engineering_spark.operators import graphops as GR
from f1_data_engineering_spark.operators import integrity as IG
from f1_data_engineering_spark.operators import merge as MG
from f1_data_engineering_spark.operators.dedup import lsh_recall_audit
from f1_data_engineering_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def test_kmv_two_level_bottom_k_is_exact(spark):
    """The salt-bucketed local bottom-K prune followed by the per-group
    rank must equal the naive global bottom-K (bottom-K member ⇒
    bottom-K of its salt bucket)."""
    from pyspark.sql import Window as W

    rows = [("g", h) for h in range(997, 0, -7)] + [("h2", h) for h in range(500)]
    df = spark.createDataFrame(rows, "g string, h long")
    naive = {
        (r["g"], r["h"])
        for r in df.withColumn(
            "rn", F.row_number().over(W.partitionBy("g").orderBy("h"))
        )
        .filter(F.col("rn") <= A5.KMV_K)
        .collect()
    }
    local = (
        df.withColumn("salt", F.pmod(F.col("h"), F.lit(A5.KMV_SALTS)))
        .withColumn(
            "lr", F.row_number().over(W.partitionBy("g", "salt").orderBy("h"))
        )
        .filter(F.col("lr") <= A5.KMV_K)
    )
    two_level = {
        (r["g"], r["h"])
        for r in local.withColumn(
            "rn", F.row_number().over(W.partitionBy("g").orderBy("h"))
        )
        .filter(F.col("rn") <= A5.KMV_K)
        .collect()
    }
    assert two_level == naive


def test_kmv_estimates_track_exact(spark):
    rows = A5.kmv_set_ops(spark, SF).collect()
    assert rows, "no event-type pairs"
    for r in rows:
        # sketch never inverts containment: intersection ≤ union
        assert r["intersection_est"] <= r["union_est"] + 1e-9
        assert 0.0 <= r["jaccard_est"] <= 1.0
        # exact audit columns are consistent
        assert r["exact_intersection"] <= min(r["exact_a"], r["exact_b"])
        # KMV relative error bound ~ 1/sqrt(K-1) ≈ 13%; allow 4σ
        for est, exact in (
            (r["ndv_a_est"], r["exact_a"]),
            (r["ndv_b_est"], r["exact_b"]),
        ):
            assert abs(est - exact) <= max(0.52 * exact, 2.0), (est, exact)


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_sane_fpr(spark):
    rows = A5.bloom_prune_stats(spark, SF).collect()
    assert rows
    for r in rows:
        # a Bloom filter can NEVER reject a true match
        assert r["n_bloom_pass"] >= r["n_true_match"]
        assert r["n_false_pos"] == r["n_bloom_pass"] - r["n_true_match"]
        assert 0 < r["bits_set"] <= A5.BLOOM_BITS
        assert 0.0 <= r["est_fpr"] <= 1.0


def test_bloom_probe_plan_broadcasts_filter(spark):
    plan = A5.bloom_prune_stats(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# Weighted systematic sample
# ---------------------------------------------------------------------------


def test_weighted_sample_tick_accounting(spark):
    od = load_table(spark, SF, "orders")
    total_cents = od.select(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("t")
    ).collect()[0]["t"]
    step = max(total_cents // A5.SAMPLE_TICKS, 1)
    picked = A5.weighted_systematic_sample(spark, SF).collect()
    # every tick is claimed by exactly one row: Σ n_ticks = total // step
    assert sum(r["n_ticks"] for r in picked) == total_cents // step
    for r in picked:
        assert r["step_cents"] == step
        assert r["n_ticks"] >= 1
        # a row heavier than step ALWAYS crosses at least one tick
    heavy_included = {
        r["o_orderkey"] for r in picked if r["w_cents"] > step
    }
    heavy_all = {
        r["o_orderkey"]
        for r in od.filter(
            F.round(F.col("o_totalprice") * 100).cast("long") > step
        ).collect()
    }
    assert heavy_all == heavy_included


def test_weighted_sample_partition_invariance(spark):
    base = {
        (r["o_orderkey"], r["n_ticks"])
        for r in A5.weighted_systematic_sample(spark, SF).collect()
    }
    # result must not depend on the physical partitioning of the input
    with_conf = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = {
            (r["o_orderkey"], r["n_ticks"])
            for r in A5.weighted_systematic_sample(spark, SF).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", with_conf)
    assert base == alt


# ---------------------------------------------------------------------------
# Moments
# ---------------------------------------------------------------------------


def test_moments_match_numpy(spark):
    import numpy as np

    rows = {r["event_type"]: r for r in A5.moment_stats(spark, SF).collect()}
    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.coalesce(F.col("event_type"), F.lit("none")).alias("g"), "value"
        )
        .collect()
    )
    by_g: dict[str, list[float]] = {}
    for r in ev:
        by_g.setdefault(r["g"], []).append(r["value"])
    for g, vals in by_g.items():
        x = np.array(vals)
        n = len(x)
        mean = x.mean()
        var = ((x - mean) ** 2).mean()
        got = rows[g]
        assert got["n"] == n
        assert got["mean_value"] == pytest.approx(mean, abs=2e-6)
        assert got["std_value"] == pytest.approx(var**0.5, abs=2e-6)
        if var > 0:
            skew = (((x - mean) ** 3).mean()) / var**1.5
            kurt = (((x - mean) ** 4).mean()) / var**2 - 3.0
            assert got["skewness"] == pytest.approx(skew, abs=1e-4)
            assert got["excess_kurtosis"] == pytest.approx(kurt, abs=1e-4)


# ---------------------------------------------------------------------------
# SSSP
# ---------------------------------------------------------------------------


def test_sssp_consistent_with_bfs(spark):
    sssp = {r["node"]: r["min_cost"] for r in GR.sssp_trade_costs(spark, SF).collect()}
    hops = {r["node"]: r["hops"] for r in GR.bfs_hops_trade(spark, SF).collect()}
    assert sssp[GR.SSSP_SOURCE] == 0
    for node, h in hops.items():
        if h >= 0:
            # every edge costs ≥ 1, so a cheapest path over ≥h edges
            # costs ≥ h; and BFS-reachable (≤6 hops) ⇒ SSSP-reachable
            # (8 relaxation rounds over the same edge set)
            assert sssp[node] >= h, (node, sssp[node], h)


# ---------------------------------------------------------------------------
# DQ / snapshot diff / LSH recall
# ---------------------------------------------------------------------------


def test_dq_expectations_cover_declared_set(spark):
    rows = IG.dq_expectations(spark, SF).collect()
    got = {(r["table_name"], r["expectation"]) for r in rows}
    assert got == {(t, e) for t, e, _ in IG.DQ_EXPECTATIONS}
    by_key = {(r["table_name"], r["expectation"]): r for r in rows}
    # key uniqueness holds on the generated warehouse
    assert by_key[("orders", "o_orderkey_unique")]["status"] == "pass"
    for r in rows:
        assert (r["n_violations"] == 0) == (r["status"] == "pass")
        assert 0 <= r["n_violations"] <= r["n_rows"]


def test_snapshot_diff_reconciles(spark):
    rows = MG.snapshot_diff(spark, SF).collect()
    n = {"inserted": 0, "deleted": 0, "updated": 0, "unchanged": 0}
    for r in rows:
        n[r["change_type"]] += r["n_rows"]
    cust = load_table(spark, SF, "customer")
    n_v1 = cust.count()
    n_del = cust.filter(F.col("c_custkey") % 17 == 0).count()
    n_ins = cust.filter(F.col("c_custkey") % 23 == 5).count()
    n_upd = cust.filter(
        (F.col("c_custkey") % 17 != 0) & (F.col("c_custkey") % 10 == 3)
    ).count()
    assert n["deleted"] == n_del
    assert n["inserted"] == n_ins
    assert n["updated"] == n_upd
    assert n["deleted"] + n["updated"] + n["unchanged"] == n_v1


def test_lsh_recall_audit_invariants(spark):
    rows = lsh_recall_audit(spark, SF).collect()
    assert rows, "no true near-dup pairs found (planted dups missing?)"
    for r in rows:
        assert 0 <= r["n_lsh_hits"] <= r["n_true_pairs"]
        assert 0.0 <= r["recall"] <= 1.0
        assert 0.0 <= r["expected_recall"] <= 1.0
        assert 5 <= r["jaccard_decile"] <= 10
