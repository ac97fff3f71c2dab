"""Differential fuzzing of the relational/TPC-H family.

The fixed testdata is referentially CLEAN — every order has a
customer, every lineitem an order, every key joins.  Real lakes are
not: partial loads, late dims, and deletes leave dangling foreign
keys and empty groups, which is exactly where outer joins, anti
joins, scalar subqueries, and AVG-over-empty silently diverge
between engines.  This fuzzer samples random FK-HOLED subsets of the
real sf0.001 tables (drop random customers but keep their orders,
orders but keep their lineitems, parts/suppliers under their
lineitems…) and differences the TPC-H shapes and join operators
against their DuckDB twins with the driver's rows+schema+values gate.
Column values stay realistic because rows come from the real tables —
only the referential structure is adversarial.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from f1_data_engineering_spark.operators import analytics as AN
from f1_data_engineering_spark.operators import analytics5 as A5R
from f1_data_engineering_spark.operators import analytics6 as A6R
from f1_data_engineering_spark.operators import analytics2 as A2
from f1_data_engineering_spark.operators import analytics3 as A3
from f1_data_engineering_spark.operators import graphops as GR
from f1_data_engineering_spark.operators import integrity as IG
from f1_data_engineering_spark.operators import layout as LY
from f1_data_engineering_spark.operators import merge as MG
from f1_data_engineering_spark.operators import profiling as PF
from f1_data_engineering_spark.operators import relational as R
from f1_data_engineering_spark.operators import tpch_shapes as TS
from f1_data_engineering_spark.operators import tpch_shapes2 as T2

_SPEC = importlib.util.spec_from_file_location(
    "oracle_check2",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "oracle_check.py",
    ),
)
_ORACLE_CHECK = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_ORACLE_CHECK)
compare = _ORACLE_CHECK.compare


def _n_examples(default: int) -> int:
    """Soak knob: SPARK_GRAFT_FUZZ_EXAMPLES scales every fuzz test's
    example count by default-relative proportion (e.g. =40 runs the
    8-example tests at 40 and the 4-example tests at 20)."""
    base = int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "0"))
    return max(1, round(base * default / 8)) if base else default

_SRC = "/root/testdata/sf0.001"
_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
#: copied full into each lake (some queries read them alongside the
#: TPC-H tables); never subset — the FK fuzz targets the relational core
_AUX_TABLES = ("events", "documents", "embeddings")

RELATIONAL_FUZZ_QUERIES = [
    ("q1_pricing_summary", R.q1_pricing_summary, "ORACLE_Q1", R),
    ("q6_forecast_revenue", R.q6_forecast_revenue, "ORACLE_Q6", R),
    ("q17_small_quantity_revenue", R.q17_small_quantity_revenue, "ORACLE_Q17", R),
    ("q18_large_orders", R.q18_large_orders, "ORACLE_Q18", R),
    ("filter_project", R.filter_project, "ORACLE_FILTER_PROJECT", R),
    ("join_customer_nation_region", R.join_customer_nation_region, "ORACLE_JOIN_CNR", R),
    ("revenue_by_nation", R.revenue_by_nation, "ORACLE_REVENUE_NATION", R),
    ("semi_anti_join", R.semi_anti_join, "ORACLE_SEMI_ANTI", R),
    ("outer_join_order_counts", R.outer_join_order_counts, "ORACLE_OUTER_COUNTS", R),
    ("rank_orders_per_customer", R.rank_orders_per_customer, "ORACLE_RANK_ORDERS", R),
    ("top_orders", R.top_orders, "ORACLE_TOP_ORDERS", R),
    ("set_ops_keys", R.set_ops_keys, "ORACLE_SET_OPS", R),
    ("rollup_order_priority", R.rollup_order_priority, "ORACLE_ROLLUP", R),
    ("cube_status_priority", R.cube_status_priority, "ORACLE_CUBE", R),
    ("pivot_returnflag", R.pivot_returnflag, "ORACLE_PIVOT", R),
    ("agg_stats", R.agg_stats, "ORACLE_AGG_STATS", R),
    ("stint_summary", R.stint_summary, "ORACLE_STINT", R),
    ("grouping_sets_revenue", AN.grouping_sets_revenue, "ORACLE_GROUPING_SETS", AN),
    ("modal_quantity_per_flag", AN.modal_quantity_per_flag, "ORACLE_MODE", AN),
    ("q3_shipping_priority", TS.q3_shipping_priority, "ORACLE_Q3", TS),
    ("q4_late_shipment_orders", TS.q4_late_shipment_orders, "ORACLE_Q4", TS),
    ("q12_priority_by_month", TS.q12_priority_by_month, "ORACLE_Q12", TS),
    ("q14_promo_revenue", TS.q14_promo_revenue, "ORACLE_Q14", TS),
    ("q16_supplier_variety", TS.q16_supplier_variety, "ORACLE_Q16", TS),
    ("q19_disjunctive_revenue", TS.q19_disjunctive_revenue, "ORACLE_Q19", TS),
    ("q22_idle_customers", TS.q22_idle_customers, "ORACLE_Q22", TS),
    ("q2_min_cost_supplier", T2.q2_min_cost_supplier, "ORACLE_Q2", T2),
    ("q5_local_supplier_volume", T2.q5_local_supplier_volume, "ORACLE_Q5", T2),
    ("q7_nation_trade_flows", T2.q7_nation_trade_flows, "ORACLE_Q7", T2),
    ("q8_market_share", T2.q8_market_share, "ORACLE_Q8", T2),
    ("q9_product_profit", T2.q9_product_profit, "ORACLE_Q9", T2),
    ("q10_returned_items", T2.q10_returned_items, "ORACLE_Q10", T2),
    ("q11_important_parts", T2.q11_important_parts, "ORACLE_Q11", T2),
    ("q15_top_supplier", T2.q15_top_supplier, "ORACLE_Q15", T2),
    ("q20_heavy_shippers", T2.q20_heavy_shippers, "ORACLE_Q20", T2),
    ("q21_waiting_suppliers", T2.q21_waiting_suppliers, "ORACLE_Q21", T2),
    ("profile_orders", PF.profile_orders, "ORACLE_PROFILE_ORDERS", PF),
    ("numeric_corr_matrix", PF.numeric_corr_matrix, "ORACLE_CORR_MATRIX", PF),
    # orders/customer-keyed operators: deletion-neighborhood pairs,
    # weighted sampling, date spines, layout planning, SCD2 merges,
    # and the FK audit — on FK-holed lakes the audit actually has
    # orphans to find
    ("fuzzy_name_pairs", A2.fuzzy_name_pairs, "ORACLE_FUZZY", A2),
    ("priority_sample_orders", A2.priority_sample_orders, "ORACLE_PRIORITY_SAMPLE", A2),
    ("daily_order_spine", AN.daily_order_spine, "ORACLE_DAILY_SPINE", AN),
    ("zorder_tile_stats", LY.zorder_tile_stats, "ORACLE_ZORDER_TILES", LY),
    ("compaction_plan", LY.compaction_plan, "ORACLE_COMPACTION", LY),
    ("scd2_customer_merge", MG.scd2_customer_merge, "ORACLE_SCD2", MG),
    ("scd2_point_in_time", MG.scd2_point_in_time, "ORACLE_SCD2_PIT", MG),
    ("stratified_sample_orders", PF.stratified_sample_orders, "ORACLE_STRATIFIED_SAMPLE", PF),
    ("fk_orphan_audit", IG.fk_orphan_audit, "ORACLE_FK_AUDIT", IG),
    # skyline: per-date champions + running max — FK holes shuffle
    # which dates survive, stressing the frontier's strictness edges
    ("pareto_frontier_orders", A3.pareto_frontier_orders, "ORACLE_PARETO_FRONTIER", A3),
    # sort/limit/set-op/window surfaces whose tie-breaks and two-level
    # rank plans must hold on arbitrary FK-holed key distributions
    ("distinct_sorted_types", R.distinct_sorted_types, "ORACLE_DISTINCT_TYPES", R),
    ("unpivot_measures", R.unpivot_measures, "ORACLE_UNPIVOT", R),
    ("stride_downsample", R.stride_downsample, "ORACLE_STRIDE", R),
    ("orderkey_islands", AN.orderkey_islands, "ORACLE_ISLANDS", AN),
    ("window_rank_suite", AN.window_rank_suite, "ORACLE_RANK_SUITE", AN),
    ("range_join_events_orders", R.range_join_events_orders, "ORACLE_RANGE_JOIN", R),
    # graph wave: FK holes reshape the trade graph arbitrarily —
    # nations losing all their customers become DANGLING PageRank
    # nodes (the dm term), and the triangle census must hold on any
    # edge subset
    ("pagerank_nations", GR.pagerank_nations, "ORACLE_PAGERANK", GR),
    ("triangle_count_trade", GR.triangle_count_trade, "ORACLE_TRIANGLES", GR),
    # BFS: FK holes can delete the source nation itself (both engines
    # must then report every hop as -1), orphan edge endpoints (the
    # nation-restriction semi-joins drop them), or disconnect the graph
    ("bfs_hops_trade", GR.bfs_hops_trade, "ORACLE_BFS", GR),
    # round-6: bounded SSSP (FK holes can delete the source, orphan
    # endpoints, or disconnect the graph — min_cost must mirror the
    # recursive walk exactly), the DQ suite (holes CREATE violations),
    # CDC snapshot diff (holes reshape the synthetic v2), the planner
    # calibration (NDV/exact under arbitrary key distributions), exact
    # PPS sampling (cumsum/tick arithmetic on any weight profile),
    # Bloom pruning (filters built over holed key sets), and the
    # replication checksums (layout-independence on every lake)
    ("sssp_trade_costs", GR.sssp_trade_costs, "ORACLE_SSSP", GR),
    ("dq_expectations", IG.dq_expectations, "ORACLE_DQ", IG),
    ("snapshot_diff", MG.snapshot_diff, "ORACLE_SNAPSHOT_DIFF", MG),
    ("join_cardinality_estimate", A6R.join_cardinality_estimate, "ORACLE_JOIN_CARD", A6R),
    ("weighted_systematic_sample", A5R.weighted_systematic_sample, "ORACLE_WEIGHTED_SAMPLE", A5R),
    ("bloom_prune_stats", A5R.bloom_prune_stats, "ORACLE_BLOOM", A5R),
    ("table_checksum", IG.table_checksum, "ORACLE_TABLE_CHECKSUM", IG),
]


@pytest.fixture(scope="module")
def base_tables():
    return {
        t: pq.read_table(os.path.join(_SRC, f"{t}.parquet"))
        for t in _TABLES + _AUX_TABLES
    }


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("rel_fuzz")


_counter = [0]


def _keep_mask(rng, n, frac):
    return rng.random_sample(n) < frac


@pytest.mark.soak
@settings(
    max_examples=_n_examples(5),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 2**31 - 1),
    cust_frac=st.floats(0.0, 1.0),
    supp_frac=st.floats(0.1, 1.0),
    part_frac=st.floats(0.1, 1.0),
    order_frac=st.floats(0.05, 1.0),
    line_frac=st.floats(0.05, 1.0),
)
def test_relational_operators_differential_fuzz(
    spark, base_tables, fuzz_dir, seed, cust_frac, supp_frac, part_frac,
    order_frac, line_frac,
):
    """Random FK-holed micro-lakes: customers dropped under their
    orders (dangling o_custkey), orders dropped under their lineitems
    (dangling l_orderkey), parts/suppliers dropped under lineitem
    references, childless orders, idle customers.  Dims region/nation
    stay full (TPC-H semantics)."""
    rng = np.random.RandomState(seed)
    _counter[0] += 1
    sf_dir = str(fuzz_dir / f"lake{_counter[0]}")
    os.makedirs(sf_dir, exist_ok=True)

    sub = dict(base_tables)
    # independent subsetting per table — FK holes appear on BOTH sides
    for t, frac in (
        ("customer", cust_frac),
        ("supplier", supp_frac),
        ("part", part_frac),
        ("orders", order_frac),
        ("lineitem", line_frac),
    ):
        tab = base_tables[t]
        sub[t] = tab.filter(_keep_mask(rng, tab.num_rows, frac))
    for t in _TABLES + _AUX_TABLES:
        pq.write_table(sub[t], os.path.join(sf_dir, f"{t}.parquet"))

    con = duckdb.connect()
    for t in _TABLES + _AUX_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(sf_dir, t + '.parquet')}'"
        )
    for name, fn, oracle_attr, mod in RELATIONAL_FUZZ_QUERIES:
        sdf = fn(spark, sf_dir).toPandas()
        odf = con.execute(getattr(mod, oracle_attr)).df()
        problems = compare(name, sdf, odf)
        assert not problems, (name, problems, seed)


def test_q1_avg_half_boundary_regression(spark, tmp_path):
    """Direct pin of the fuzz-found 6-dp HALF-boundary divergence
    (seed 1240410218): a lineitem group whose discount-cents sum to
    201 over 32 rows gives avg_disc = 201/3200 = 0.0628125 — exactly a
    6-dp HALF boundary.  Spark's round(double, 6) is HALF_UP on the
    shortest decimal repr (→ 0.062813); DuckDB's native ROUND scales
    the double (62812.4999… → 0.062812).  ORACLE_Q1's averages now run
    the double→VARCHAR→DECIMAL(38,30) chain so both engines agree at
    the boundary."""
    import pandas as pd
    import pyarrow as pa

    rows = []
    for i in range(32):
        rows.append(
            dict(
                l_orderkey=i,
                l_partkey=1,
                l_suppkey=1,
                l_quantity=1.0,
                l_extendedprice=100.0,
                l_discount=0.06 if i < 31 else 0.15,  # cents: 31*6+15=201
                l_tax=0.0,
                l_returnflag="A",
                l_linestatus="F",
                l_shipdate=pd.Timestamp("1995-01-01"),
            )
        )
    df = pd.DataFrame(rows)
    df["l_shipdate"] = df["l_shipdate"].astype("datetime64[us]")
    sf_dir = str(tmp_path / "lake")
    os.makedirs(sf_dir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(df), os.path.join(sf_dir, "lineitem.parquet")
    )

    sdf = R.q1_pricing_summary(spark, sf_dir).toPandas()
    assert sdf.loc[0, "avg_disc"] == 0.062813  # the boundary, rounded UP

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'lineitem.parquet')}'"
    )
    odf = con.execute(R.ORACLE_Q1).df()
    assert compare("q1_boundary", sdf, odf) == []
