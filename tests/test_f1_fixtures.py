"""F1 fixture surface (operators/f1_fixture_queries.py): the committed
seed-42 parquet under fixtures/f1fix/ plus the five oracle-checked
queries over it.  Values are pinned by the DuckDB differential gate;
these tests pin the fixture contract itself (shape, planted edge
cases) so a regenerated fixture that breaks parity assumptions fails
loudly here."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from f1_data_engineering_spark.operators import f1_fixture_queries as FX


def test_fixture_files_exist():
    for p in (FX._LAPS, FX._TELEM, FX._WEATHER):
        assert os.path.exists(p), f"run scripts/make_f1_fixtures.py: missing {p}"


def test_fixture_parity_assumptions():
    laps = pq.read_table(FX._LAPS).to_pandas()
    # ms-exact lap times (formatting never hits a rounding tie)
    lt = laps["LapTimeSeconds"].dropna()
    assert ((lt * 1000).round() - lt * 1000).abs().max() < 1e-6
    # planted edge cases for the P filters
    assert laps["Driver"].isna().any()
    assert laps["LapTimeSeconds"].isna().any()
    assert laps["Stint"].isna().any()
    assert (~laps["IsAccurate"]).any()
    tel = pq.read_table(FX._TELEM).to_pandas()
    # integer-valued channels on the exact 0.5 s grid (decimal casts exact)
    assert (tel["Speed"] % 1 == 0).all()
    assert (tel["SessionTimeSeconds"] * 2 % 1 == 0).all()
    # out-of-window samples exist for the J1 reject path
    assert (tel["SessionTimeSeconds"] < 0).any()


def test_f1_queries_shapes(spark):
    lt = FX.f1_lap_times(spark, "")
    assert lt.columns == ["Driver", "LapNumber", "LapTimeSeconds", "LapTime",
                          "Compound", "Stint"]
    rows = lt.collect()
    assert len(rows) > 500
    assert all(r["LapTimeSeconds"] > 0 and r["Driver"] for r in rows)

    summ = FX.f1_lap_telemetry_summary(spark, "").collect()
    assert len(summ) > 900
    ok = [r for r in summ if r["MaxDistance"] is not None]
    # plausibility: a lap integrates to a few km at F1 speeds
    assert all(1000 < r["MaxDistance"] < 20000 for r in ok)
    assert any(r["DRSActive"] for r in summ)
    assert all(r["TotalGearChanges"] >= 0 for r in summ)

    piv = FX.f1_stint_pivot(spark, "")
    assert piv.columns == ["Driver", "SOFT", "MEDIUM", "HARD",
                           "INTERMEDIATE", "WET"]
    wx = FX.f1_weather_trends(spark, "")
    ticks = [r for r in wx.collect() if r["is_tick"]]
    assert len(ticks) == 10


def test_generator_reproduces_committed_fixtures(tmp_path, monkeypatch):
    """The lazy self-heal in f1_fixture_queries regenerates fixtures on
    a checkout that lacks them and ASSUMES the output is value-identical
    to the committed files (the oracle SQL strings read the same paths).
    Pin that: running the generator into a scratch dir must reproduce
    the committed VALUES (content equality, not raw bytes — parquet
    bytes vary with pyarrow/zstd versions, and the self-heal contract
    only needs value identity)."""
    import importlib.util

    import pyarrow.parquet as pq

    spec = importlib.util.spec_from_file_location(
        "gen", os.path.join(os.path.dirname(FX.FIX_DIR.rstrip("/")).rsplit("/fixtures", 1)[0],
                            "scripts", "make_f1_fixtures.py")
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    monkeypatch.setattr(gen, "OUT_DIR", str(tmp_path))
    gen.main()
    for name in ("laps", "telemetry", "weather"):
        committed = pq.read_table(os.path.join(FX.FIX_DIR, f"{name}.parquet"))
        fresh = pq.read_table(os.path.join(str(tmp_path), f"{name}.parquet"))
        assert committed.schema.equals(fresh.schema), (
            f"{name}: generator schema drifted from committed fixture"
        )
        assert committed.equals(fresh), (
            f"{name}: generator values drifted from committed fixture"
        )
