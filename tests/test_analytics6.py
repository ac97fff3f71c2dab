"""Unit/property tests for the round-6b wave (analytics6): incremental
rollup merge, join-cardinality estimates, session paths, vocab
coverage.  Cross-engine parity is the differential gate's job; these
pin the algebraic invariants."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from f1_data_engineering_spark.operators import analytics6 as A6
from f1_data_engineering_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def test_incremental_merge_equals_one_shot(spark):
    """merge(partial(base), partial(increment)) must equal the one-shot
    rollup EXACTLY (decimal state is associative — that's the point)."""
    merged = {
        r["bucket"]: (r["n"], r["sum_value"], r["avg_value"])
        for r in A6.incremental_rollup_merge(spark, SF).collect()
    }
    full = (
        load_table(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.date_trunc("hour", "ts").alias("bucket"),
            F.col("value").cast("decimal(28,10)").alias("v"),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .select(
            "bucket",
            "n",
            F.col("s").cast("double").alias("sum_value"),
            F.round(F.col("s").cast("double") / F.col("n"), 6).alias("avg_value"),
        )
        .collect()
    )
    assert merged == {
        r["bucket"]: (r["n"], r["sum_value"], r["avg_value"]) for r in full
    }


def test_join_cardinality_fk_edges_are_exact(spark):
    """On clean FK edges with uniform keys the uniformity estimate is
    exact (every child row matches exactly one parent): est == exact
    when the parent key is unique and covers the child."""
    rows = {r["join_edge"]: r for r in A6.join_cardinality_estimate(spark, SF).collect()}
    assert set(rows) == {e[0] for e in A6.JOIN_EDGES}
    li = rows["lineitem*orders"]
    # orders.o_orderkey is unique → ndv_right == n_right and the
    # estimate collapses to |lineitem| == exact join size
    assert li["ndv_right"] == li["n_right"]
    assert li["exact_rows"] == li["n_left"]
    assert li["rel_err"] == pytest.approx(0.0, abs=1e-9)
    for r in rows.values():
        assert r["est_rows"] > 0
        assert r["exact_rows"] >= 0


def test_session_paths_bounded_and_consistent(spark):
    rows = A6.top_session_paths(spark, SF).collect()
    assert rows
    total_share = sum(r["session_share"] for r in rows)
    assert total_share <= 1.0 + 1e-6
    for r in rows:
        assert 1 <= len(r["path"].split(">")) <= A6.PATH_MAX_STEPS
        assert 0 <= r["n_converted"] <= r["n"]
        # a path containing 'purchase' must have every session converted
        if "purchase" in r["path"].split(">"):
            assert r["n_converted"] == r["n"]


def test_vocab_coverage_bounds(spark):
    rows = A6.vocab_coverage_eval(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_in_vocab"] <= r["n_tokens"]
        assert 0.0 <= r["oov_rate"] <= 1.0
        # top-500 vocab over a synthetic corpus should cover most mass
        assert r["oov_rate"] < 0.9
