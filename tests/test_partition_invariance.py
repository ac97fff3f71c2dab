"""Run-determinism under different physical partitionings.

The repo's float-parity design rests on one claim: every aggregate
that feeds the differential gate is ORDER-INDEPENDENT (exact decimal
internals, deterministic tie-breaks), so the result is identical no
matter how Spark partitions the data — 3 shuffle partitions or 32,
one input split or many.  A plain double sum would break this (partial
merge order varies with partitioning) in exactly the way that only
shows up on a real cluster.  These tests change
``spark.sql.shuffle.partitions`` at runtime and re-run
float-producing queries, asserting BIT-IDENTICAL results.
"""

from __future__ import annotations

import pytest

#: Float-heavy queries spanning the aggregate/window/pair-join shapes.
#: (name kept for failure messages; import inside to reuse the session)
CASES = [
    ("q1_pricing_summary", "relational"),
    ("running_total", "relational"),
    ("revenue_by_nation", "relational"),
    ("dsir_importance_weights", "trainprep"),
    ("ngram_jaccard_pairs", "dedup"),
    ("f1_lap_telemetry_summary", "f1_fixture_queries"),
    # round-4 wave: decimal log-sum entropy, rolling integer-sum
    # z-scores, and two-stage rounded percentiles
    ("token_entropy", "textops"),
    ("sliding_zscore_anomaly", "analytics3"),
    ("mad_outlier_events", "analytics3"),
]


def _rows_key(df):
    """Fully-materialized, order-insensitive, exact representation."""
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("name,mod", CASES)
def test_result_invariant_to_shuffle_partitioning(spark, sf_dir, name, mod):
    import importlib

    fn = getattr(
        importlib.import_module(f"f1_data_engineering_spark.operators.{mod}"),
        name,
    )
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows_key(fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = _rows_key(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b, f"{name}: result depends on shuffle partitioning"
