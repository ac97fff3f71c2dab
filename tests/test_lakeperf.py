"""The registered lake access-path queries (operators/lakeperf.py):
the in-query skip-path guards must actually FIRE on a pruning
regression — the oracle can only see rows, so these assertions are the
gate's eyes on file skipping, and a guard that never trips is no
guard."""

from __future__ import annotations

import pytest

from f1_data_engineering_spark.operators import lakeperf as LP
from f1_data_engineering_spark.sources import bloomindex as BI
from f1_data_engineering_spark.sources import versioned as V


def test_bloom_guard_fires_when_index_stops_pruning(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Simulate a skip-path regression (every lookup scans every
    file — e.g. a saturated bitmap or a build/probe hash mismatch):
    the query must raise, not return a quietly-slow correct answer."""
    real = BI.read_versioned_bloom_pruned

    def no_pruning(spark_, path, column, value):
        df, _, total = real(spark_, path, column, value)
        return df, total, total  # "scanned everything"

    monkeypatch.setattr(BI, "read_versioned_bloom_pruned", no_pruning)
    # lakeperf resolved the module (not the function), so the patch is
    # visible through its BI reference
    with pytest.raises(AssertionError, match="bloom skip-path regression"):
        LP.bloom_point_lookup_orders(spark, sf_dir, work_dir=str(tmp_path / "b"))


def test_zorder_guard_fires_when_stats_stop_pruning(
    spark, sf_dir, tmp_path, monkeypatch
):
    real = V.read_versioned_pruned

    def no_pruning(spark_, path, column, lo, hi, version=None):
        df, _, total = real(spark_, path, column, lo, hi, version)
        return df, total, total

    monkeypatch.setattr(
        "f1_data_engineering_spark.operators.lakeperf.V.read_versioned_pruned",
        no_pruning,
    )
    with pytest.raises(AssertionError, match="z-order skip-path regression"):
        LP.zorder_pruning_orders(spark, sf_dir, work_dir=str(tmp_path / "z"))
