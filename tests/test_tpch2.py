"""Semantic pins for the Q2/Q7-Q11/Q15/Q20/Q21 shapes.

The DuckDB oracle gate checks value parity; these tests pin the
*meaning* (decorrelations really equal their correlated originals,
thresholds really hold) against brute-force pandas recomputations at
sf0.001, plus plan-shape assertions for the broadcast/semi choices.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from f1_data_engineering_spark.operators import tpch_shapes2 as T2
from f1_data_engineering_spark.sources.registry import load_table


def test_q2_winners_are_minimal(spark, sf_dir):
    out = T2.q2_min_cost_supplier(spark, sf_dir).toPandas()
    assert len(out) > 0
    # recompute the per-pair min unit cost by brute force
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li["unit_cost"] = li.l_extendedprice / li.l_quantity
    pair_min = li.groupby(["l_partkey", "l_suppkey"]).unit_cost.min()
    sup = load_table(spark, sf_dir, "supplier").toPandas()
    nat = load_table(spark, sf_dir, "nation").toPandas()
    reg = load_table(spark, sf_dir, "region").toPandas()
    eur_nations = nat.merge(reg[reg.r_name == "EUROPE"], left_on="n_regionkey",
                            right_on="r_regionkey").n_nationkey
    eur_sup = set(sup[sup.s_nationkey.isin(eur_nations)].s_suppkey)
    eur_pairs = pair_min[pair_min.index.get_level_values(1).map(lambda k: k in eur_sup)]
    part_best = eur_pairs.groupby(level=0).min()
    sup_by_name = sup.set_index("s_name").s_suppkey
    for row in out.itertuples():
        sk = sup_by_name[row.s_name]
        assert eur_pairs[(row.p_partkey, sk)] == part_best[row.p_partkey]


def test_q21_decorrelation_matches_correlated_bruteforce(spark, sf_dir):
    out = T2.q21_waiting_suppliers(spark, sf_dir).toPandas()
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    o = o[o.o_orderstatus == "F"]
    lo = li.merge(o[["o_orderkey", "o_orderdate"]], left_on="l_orderkey",
                  right_on="o_orderkey")
    lo["late"] = lo.l_shipdate > lo.o_orderdate + pd.Timedelta(days=90)
    waits: dict[int, set[int]] = {}
    for ok, grp in lo.groupby("l_orderkey"):
        supps = set(grp.l_suppkey)
        late_supps = set(grp[grp.late].l_suppkey)
        # correlated form: l1 late; exists other supplier; no OTHER late supplier
        for sk in late_supps:
            if len(supps) >= 2 and not (late_supps - {sk}):
                waits.setdefault(sk, set()).add(ok)
    sup = load_table(spark, sf_dir, "supplier").toPandas()
    expected = (
        pd.DataFrame(
            [(sup[sup.s_suppkey == k].s_name.iloc[0], len(v)) for k, v in waits.items()],
            columns=["s_name", "numwait"],
        )
        .sort_values(["numwait", "s_name"], ascending=[False, True])
        .head(100)
        .reset_index(drop=True)
    )
    got = out.reset_index(drop=True)
    got["numwait"] = got.numwait.astype(int)
    pd.testing.assert_frame_equal(got, expected)


def test_q11_rows_exceed_threshold_and_complement_does_not(spark, sf_dir):
    out = T2.q11_important_parts(spark, sf_dir).toPandas()
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    sup = load_table(spark, sf_dir, "supplier").toPandas()
    nat = load_table(spark, sf_dir, "nation").toPandas()
    reg = load_table(spark, sf_dir, "region").toPandas()
    eur_nations = nat.merge(reg[reg.r_name == "EUROPE"], left_on="n_regionkey",
                            right_on="r_regionkey").n_nationkey
    eur_sup = set(sup[sup.s_nationkey.isin(eur_nations)].s_suppkey)
    li = li[li.l_suppkey.isin(eur_sup)]
    cents = (li.l_extendedprice * 100.0).round().astype("int64") * li.l_quantity.astype(
        "int64"
    )
    per_part = cents.groupby(li.l_partkey).sum()
    total = per_part.sum()
    expected = set(per_part[per_part * 10000 > total].index)
    assert set(out.p_partkey) == expected


def test_q20_condition_holds_for_selected_suppliers(spark, sf_dir):
    out = T2.q20_heavy_shippers(spark, sf_dir).toPandas()
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    part = load_table(spark, sf_dir, "part").toPandas()
    small = set(part[part.p_name.str.startswith("small")].p_partkey)
    li = li[li.l_partkey.isin(small)]
    q = li.l_quantity.astype("int64")
    q97 = q.where(li.l_shipdate.dt.year == 1997, 0)
    g = pd.DataFrame(
        {"q_all": q.groupby([li.l_suppkey, li.l_partkey]).sum(),
         "q97": q97.groupby([li.l_suppkey, li.l_partkey]).sum()}
    )
    heavy = set(g[2 * g.q97 > g.q_all].index.get_level_values(0))
    assert set(out.s_suppkey) == heavy


def test_q2_and_q10_plans_use_broadcast_and_take_ordered(spark, sf_dir):
    q10_plan = T2.q10_returned_items(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in q10_plan
    q2_plan = T2.q2_min_cost_supplier(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in q2_plan
    assert "NestedLoop" not in q2_plan.replace("BroadcastNestedLoopJoin", "")  # guard

    q20_plan = T2.q20_heavy_shippers(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in q20_plan
