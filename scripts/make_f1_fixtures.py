"""Generate deterministic F1-native fixture parquet (FIXTURES.md family A).

The driver's testdata has no F1-shaped tables, so the reference's own
query surface (laps / telemetry / weather / stints — streamlit_app.py
display_* views and the f1_dataExtractor.py:251-302 telemetry engine)
could previously only be pytest-checked.  This script materializes
small, seed-pinned silver tables under fixtures/f1fix/ so those
queries run under the same DuckDB differential gate as everything else
(operators/f1_fixture_queries.py reads them by absolute path).

Parity-by-construction choices (see operators/relational.py docstring
for the repo-wide conventions):

* ``LapTimeSeconds`` / ``LapStartSessionSeconds`` are millisecond-exact
  doubles — formatting to MM:SS:mmm never lands on a rounding tie.
* Telemetry channels are integer-valued doubles on an exact 0.5 s
  sample grid — double->decimal casts in the aggregation layer are
  exact, so Spark and DuckDB sums agree bit-for-bit.
* Planted nulls / inaccurate laps / out-of-window samples exercise the
  P4/P9 filters and the J1 band join's reject path.

Output is committed to git (a few MB); rerun only to change the shape,
never per-round.  Usage:  python scripts/make_f1_fixtures.py
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "fixtures", "f1fix")

DRIVERS = [
    ("VER", 1, "Red Bull Racing"), ("PER", 11, "Red Bull Racing"),
    ("HAM", 44, "Mercedes"), ("RUS", 63, "Mercedes"),
    ("LEC", 16, "Ferrari"), ("SAI", 55, "Ferrari"),
    ("NOR", 4, "McLaren"), ("PIA", 81, "McLaren"),
    ("ALO", 14, "Aston Martin"), ("STR", 18, "Aston Martin"),
    ("OCO", 31, "Alpine"), ("GAS", 10, "Alpine"),
    ("ALB", 23, "Williams"), ("SAR", 2, "Williams"),
    ("TSU", 22, "RB"), ("RIC", 3, "RB"),
    ("BOT", 77, "Kick Sauber"), ("ZHO", 24, "Kick Sauber"),
    ("MAG", 20, "Haas"), ("HUL", 27, "Haas"),
]
COMPOUNDS = ["SOFT", "MEDIUM", "HARD", "INTERMEDIATE", "WET"]
N_LAPS = 57
SAMPLE_DT = 0.5  # s, exactly representable in binary


def _ms(rng: np.random.RandomState, lo_ms: int, hi_ms: int) -> float:
    """Millisecond-exact double seconds in [lo_ms, hi_ms]."""
    return rng.randint(lo_ms, hi_ms + 1) / 1000.0


def gen_laps(rng: np.random.RandomState):
    rows = []
    for code, num, team in DRIVERS:
        # a few retirements: laps completed varies
        n = N_LAPS if rng.rand() > 0.15 else rng.randint(10, N_LAPS)
        start = _ms(rng, 0, 20_000)  # staggered pit-exit / grid offset
        stint, tyre_life = 1, 1
        compound = COMPOUNDS[rng.randint(0, 3)]
        for lap in range(1, n + 1):
            base = 88_000 + 9_000 * rng.rand()
            lap_ms = int(base)
            lap_time = lap_ms / 1000.0
            pit = lap > 1 and rng.rand() < 0.05
            if pit:
                stint += 1
                tyre_life = 1
                compound = COMPOUNDS[rng.randint(0, 3)]
                lap_time = (lap_ms + 22_000) / 1000.0  # in-lap + stop
            is_accurate = (not pit) and rng.rand() > 0.08
            # planted nulls: in/out laps lose LapTime; rare null Stint
            lap_time_out = None if (pit and rng.rand() < 0.5) else lap_time
            rows.append(dict(
                Driver=code, DriverNumber=num, Team=team, LapNumber=lap,
                LapTimeSeconds=lap_time_out,
                LapStartSessionSeconds=round(start, 3),
                Stint=None if rng.rand() < 0.02 else stint,
                Compound=compound,
                TyreLife=tyre_life,
                IsAccurate=bool(is_accurate),
            ))
            start = round(start + lap_time, 3)
            tyre_life += 1
    # a couple of fully-null driver rows (P-filter edge)
    rows.append(dict(Driver=None, DriverNumber=99, Team="Ghost", LapNumber=1,
                     LapTimeSeconds=91.5, LapStartSessionSeconds=10.0,
                     Stint=1, Compound="SOFT", TyreLife=1, IsAccurate=True))
    schema = pa.schema([
        ("Driver", pa.string()), ("DriverNumber", pa.int32()),
        ("Team", pa.string()), ("LapNumber", pa.int32()),
        ("LapTimeSeconds", pa.float64()),
        ("LapStartSessionSeconds", pa.float64()),
        ("Stint", pa.int32()), ("Compound", pa.string()),
        ("TyreLife", pa.int32()), ("IsAccurate", pa.bool_()),
    ])
    cols = {f.name: [r[f.name] for r in rows] for f in schema}
    return pa.table(cols, schema=schema), rows


def gen_telemetry(rng: np.random.RandomState, lap_rows):
    """~2 Hz integer-valued channels per driver over the session span."""
    by_driver: dict[str, list[dict]] = {}
    for r in lap_rows:
        if r["Driver"] is not None:
            by_driver.setdefault(r["Driver"], []).append(r)
    out = {k: [] for k in
           ("Driver", "SessionTimeSeconds", "Speed", "RPM", "Throttle",
            "Brake", "Gear", "DRS")}
    for code, laps in by_driver.items():
        t_end = max(r["LapStartSessionSeconds"] +
                    (r["LapTimeSeconds"] or 100.0) for r in laps)
        # start BEFORE the first lap window → out-of-window samples that
        # the J1 band join must reject
        t = -10.0
        gear = 2
        while t <= t_end + 10.0:
            gear += int(rng.randint(-1, 2)) if rng.rand() < 0.3 else 0
            gear = min(8, max(1, gear))
            speed = float(40 + 40 * gear + rng.randint(0, 21))
            out["Driver"].append(code)
            out["SessionTimeSeconds"].append(t)
            out["Speed"].append(speed)
            out["RPM"].append(float(4000 + 1000 * gear + 10 * rng.randint(0, 50)))
            out["Throttle"].append(float(rng.randint(0, 101)))
            out["Brake"].append(int(rng.rand() < 0.2))
            out["Gear"].append(gear)
            out["DRS"].append(int(rng.choice([0, 1, 8, 10, 12, 14],
                                             p=[.55, .15, .1, .1, .05, .05])))
            t += SAMPLE_DT
    schema = pa.schema([
        ("Driver", pa.string()), ("SessionTimeSeconds", pa.float64()),
        ("Speed", pa.float64()), ("RPM", pa.float64()),
        ("Throttle", pa.float64()), ("Brake", pa.int32()),
        ("Gear", pa.int32()), ("DRS", pa.int32()),
    ])
    return pa.table(out, schema=schema)


def gen_weather(rng: np.random.RandomState):
    n = 130  # ~1/min over the session
    out = {k: [] for k in ("SessionTimeSeconds", "AirTemp", "TrackTemp",
                           "Humidity", "Pressure", "WindSpeed",
                           "WindDirection", "Rainfall")}
    air, track = 24.0, 38.0
    for i in range(n):
        air = round(air + rng.randint(-3, 4) / 10.0, 1)
        track = round(track + rng.randint(-5, 6) / 10.0, 1)
        out["SessionTimeSeconds"].append(i * 60.0)
        out["AirTemp"].append(air)
        out["TrackTemp"].append(track)
        out["Humidity"].append(float(rng.randint(300, 700)) / 10.0)
        out["Pressure"].append(float(rng.randint(10050, 10200)) / 10.0)
        out["WindSpeed"].append(float(rng.randint(0, 250)) / 10.0)
        out["WindDirection"].append(int(rng.randint(0, 360)))
        out["Rainfall"].append(bool(rng.rand() < 0.1))
    schema = pa.schema([
        ("SessionTimeSeconds", pa.float64()), ("AirTemp", pa.float64()),
        ("TrackTemp", pa.float64()), ("Humidity", pa.float64()),
        ("Pressure", pa.float64()), ("WindSpeed", pa.float64()),
        ("WindDirection", pa.int32()), ("Rainfall", pa.bool_()),
    ])
    return pa.table(out, schema=schema)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.RandomState(42)
    laps_tbl, lap_rows = gen_laps(rng)
    tel_tbl = gen_telemetry(rng, lap_rows)
    wx_tbl = gen_weather(rng)
    for name, tbl in [("laps", laps_tbl), ("telemetry", tel_tbl),
                      ("weather", wx_tbl)]:
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        pq.write_table(tbl, path, compression="zstd")
        print(f"wrote {path}: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()
