"""The registered lake-management queries (operators/lakemgmt.py):
smoke runs at the test SF plus guard-fires tests — each query carries
in-query assertions for properties the DuckDB oracle cannot see
(hardlinks, refused commits, dry-run non-destruction, timestamp
refusals, file skipping); a guard that never trips is no guard, so
each one is driven to fire here by simulating its regression."""

from __future__ import annotations

import os

import pytest

from f1_data_engineering_spark.operators import lakemgmt as LM
from f1_data_engineering_spark.sources import constraints as C
from f1_data_engineering_spark.sources import versioned as V


def test_registered_with_oracles():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_lakemgmt_check",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, sql = mod.queries(), mod.oracle_sql()
    for name in (
        "clone_diverge_orders", "check_constraints_orders",
        "describe_detail_orders", "timestamp_as_of_orders",
        "vacuum_dry_run_orders", "zorder_scoped_orders",
    ):
        assert name in qs and name in sql, name


def test_describe_detail_smoke(spark, sf_dir, tmp_path):
    rows = LM.describe_detail_orders(
        spark, sf_dir, work_dir=str(tmp_path / "d")
    ).collect()
    got = {r["metric"]: r["value"] for r in rows}
    assert got["01_version"] == 3.0
    assert got["02_num_files"] == 8.0
    assert got["05_live_rows"] == got["03_file_rows"] - got["04_mor_deleted_rows"]


def test_vacuum_dry_run_smoke(spark, sf_dir, tmp_path):
    rows = LM.vacuum_dry_run_orders(
        spark, sf_dir, work_dir=str(tmp_path / "v")
    ).collect()
    meta = {r["stage"]: r for r in rows}["2_meta"]
    assert meta["n_rows"] == 6 and meta["checksum"] == "6"


def test_clone_copy_fallback_trips_hardlink_guard(
    spark, sf_dir, tmp_path, monkeypatch
):
    """If clone silently copies bytes instead of hardlinking (the
    cross-device fallback firing on a same-device target would mean
    the zero-copy contract regressed), the query must raise."""
    real_link = os.link

    def no_data_links(src, dst, **kw):
        if src.endswith(".parquet"):
            raise OSError("simulated cross-device link")
        return real_link(src, dst, **kw)  # log commits keep working

    monkeypatch.setattr(V.os, "link", no_data_links)
    with pytest.raises(AssertionError, match="copied bytes"):
        LM.clone_diverge_orders(spark, sf_dir, work_dir=str(tmp_path / "c"))


def test_constraint_enforcement_regression_trips_guard(
    spark, sf_dir, tmp_path, monkeypatch
):
    """If CHECK validation silently stops rejecting (the write path
    regresses to unconditional accept), the query must raise rather
    than record a wrong-but-hash-green table state."""
    monkeypatch.setattr(C, "validate_constraints", lambda df, cs: None)
    with pytest.raises(AssertionError, match="must be refused"):
        LM.check_constraints_orders(spark, sf_dir, work_dir=str(tmp_path / "k"))


def test_destructive_dry_run_trips_guard(spark, sf_dir, tmp_path, monkeypatch):
    real = V.vacuum

    def destructive_preview(path, **kw):
        kw.pop("dry_run", None)
        return real(path, dry_run=False, **kw)

    monkeypatch.setattr(V, "vacuum", destructive_preview)
    with pytest.raises(AssertionError, match="DRY RUN must"):
        LM.vacuum_dry_run_orders(spark, sf_dir, work_dir=str(tmp_path / "vd"))


def test_timestamp_clamping_trips_guard(spark, sf_dir, tmp_path, monkeypatch):
    """A TIMESTAMP AS OF that silently clamps an out-of-range timestamp
    to the head (instead of refusing) must trip the refusal assert."""
    real = V.version_at_timestamp

    def clamping(path, ts):
        try:
            return real(path, ts)
        except ValueError:
            return V.latest_version(path)

    monkeypatch.setattr(V, "version_at_timestamp", clamping)
    with pytest.raises(AssertionError, match="must be refused"):
        LM.timestamp_as_of_orders(spark, sf_dir, work_dir=str(tmp_path / "t"))


def test_zorder_scope_blowup_trips_guard(spark, sf_dir, tmp_path, monkeypatch):
    """If the scoped OPTIMIZE loses its stats-based scoping and
    rewrites the whole snapshot, the minority-rewrite assert fires."""
    from f1_data_engineering_spark.operators import layout as LY

    real = LY.zorder_versioned_scoped

    def rewrite_everything(spark_, path, cx, cy, sc, lo, hi, n_files, **kw):
        return real(spark_, path, cx, cy, sc, -(10 ** 15), 10 ** 15,
                    n_files, **kw)

    monkeypatch.setattr(LM, "zorder_versioned_scoped", rewrite_everything)
    with pytest.raises(AssertionError, match="touched too much"):
        LM.zorder_scoped_orders(spark, sf_dir, work_dir=str(tmp_path / "z"))
