"""RESTORE TABLE ... TO VERSION AS OF (sources/versioned.py
restore_versioned): snapshot equality by reference, MoR-state
restores, DV-reset interaction, incremental-reader refusal, the
vacuum guard, and a differential fuzz (restore to EVERY version of a
random DML history must reproduce the recorded state)."""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from f1_data_engineering_spark.sources import dml as D
from f1_data_engineering_spark.sources import versioned as V


def _n_examples(default: int) -> int:
    base = int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "0"))
    return max(1, round(base * default / 8)) if base else default


@pytest.fixture()
def lake(spark, tmp_path):
    """k 0..99, v = 2k, 4 range files (same shape as test_dml)."""
    t = str(tmp_path / "tbl")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.lit("x").alias("s"),
    )
    V.write_versioned(df.repartitionByRange(4, "k"), t, mode="overwrite")
    return t


def test_restore_is_by_reference_and_exact(spark, lake):
    D.delete_where(spark, lake, "k >= 90")  # v1: 90 rows
    V.write_versioned(
        spark.createDataFrame([(500, 1, "a")], "k long, v long, s string"),
        lake,
        mode="append",
    )  # v2: 91 rows
    new_v = V.restore_versioned(lake, 1)
    assert new_v == 3
    # snapshot equality BY FILE NAME — nothing was copied or rewritten
    assert V._snapshot_files(lake, 3) == V._snapshot_files(lake, 1)
    head = V.read_versioned(spark, lake)
    assert head.count() == 90
    assert head.agg(F.max("k")).first()[0] == 89
    # the rolled-back versions stay time-travelable
    assert V.read_versioned(spark, lake, version=2).count() == 91
    assert V.read_versioned(spark, lake, version=0).count() == 100
    # restore-of-a-restore: back to the 91-row state
    V.restore_versioned(lake, 2)
    assert V.read_versioned(spark, lake).count() == 91


def test_restore_to_mor_state_carries_dvs(spark, lake):
    D.delete_where_mor(spark, lake, "k % 10 = 0")  # v1: DV, 90 rows
    V.compact_versioned(spark, lake, target_rows_per_file=1000)  # v2
    V.restore_versioned(lake, 1)  # v3: v1's files + v1's DV
    head = V.read_versioned(spark, lake)
    assert head.count() == 90
    assert head.filter("k % 10 = 0").count() == 0
    assert set(V._dv_files(lake, None)) == set(V._dv_files(lake, 1))


def test_restore_past_overwrite_does_not_reapply_later_dvs(spark, lake):
    """The round-9 _dv_state point: v1's DV targets v0's FILE NAMES,
    so after restoring to v0 those names are live again — the DV must
    NOT come back with them (it belongs to a later state)."""
    D.delete_where_mor(spark, lake, "k % 10 = 0")  # v1: DV over v0 files
    V.restore_versioned(lake, 0)  # v2: the seed state
    head = V.read_versioned(spark, lake)
    assert head.count() == 100  # deleted rows ARE back: that is the point
    assert V._dv_files(lake, None) == []
    # and the MoR state remains reachable by time travel
    assert V.read_versioned(spark, lake, version=1).count() == 90


def test_restore_refuses_incremental_readers(spark, lake):
    V.write_versioned(
        spark.createDataFrame([(500, 1, "a")], "k long, v long, s string"),
        lake,
        mode="append",
    )  # v1
    V.restore_versioned(lake, 0)  # v2
    with pytest.raises(ValueError, match="restore"):
        V.read_version_delta(spark, lake, 0, 2)
    with pytest.raises(ValueError, match="restore"):
        D.read_change_feed(spark, lake, 0, 2)
    # ranges that stop BEFORE the restore still work
    assert V.read_version_delta(spark, lake, 0, 1).count() == 1


def test_restore_guards(spark, lake):
    with pytest.raises(ValueError, match="does not exist"):
        V.restore_versioned(lake, 7)
    # vacuumed target snapshot: clear refusal, not a broken commit
    D.delete_where(spark, lake, "k >= 50")  # v1 rewrites files
    V.vacuum(lake, retain_versions=0, min_age_seconds=0.0)
    with pytest.raises(ValueError, match="vacuumed"):
        V.restore_versioned(lake, 0)
    # head stays readable and un-advanced
    assert V.latest_version(lake) == 1
    assert V.read_versioned(spark, lake).count() == 50


_counter = [0]

_OPS = ["del_cow", "del_mor", "update", "append", "compact"]


@settings(
    max_examples=_n_examples(6),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_rows=st.integers(1, 40),
    n_files=st.integers(1, 4),
    ops=st.lists(st.sampled_from(_OPS), min_size=1, max_size=4),
    data=st.data(),
)
def test_restore_every_version_fuzz(
    spark, tmp_path_factory, n_rows, n_files, ops, data
):
    """For ANY history of CoW/MoR deletes, updates, appends and
    compactions: restoring to each version v (in a random order, so
    restore-of-restore chains are exercised) must make the head read
    EXACTLY the state recorded at v — including MoR states, whose DVs
    ride along with the restore."""
    _counter[0] += 1
    t = str(tmp_path_factory.mktemp("rfz") / f"t{_counter[0]}")
    df = spark.range(0, n_rows).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    V.write_versioned(df.repartition(n_files), t, mode="overwrite")

    def snap():
        return sorted(
            tuple(r) for r in V.read_versioned(spark, t).select("k", "v").collect()
        )

    states = {0: snap()}
    for i, op in enumerate(ops):
        mod = 2 + i  # varying predicates so states differ
        if op == "del_cow":
            D.delete_where(spark, t, f"k % {mod} = 0")
        elif op == "del_mor":
            D.delete_where_mor(spark, t, f"k % {mod} = 1")
        elif op == "update":
            D.update_where(spark, t, f"k % {mod} = 1", {"v": "v + 100"})
        elif op == "append":
            V.write_versioned(
                spark.createDataFrame([(1000 + i, -i)], "k long, v long"),
                t,
                mode="append",
            )
        else:
            V.compact_versioned(spark, t, target_rows_per_file=1000)
        head_v = V.latest_version(t)
        if head_v not in states:  # no-op DMLs don't commit a version
            states[head_v] = snap()

    versions = data.draw(
        st.permutations(sorted(states)), label="restore_order"
    )
    for ver in versions:
        V.restore_versioned(t, ver)
        assert snap() == states[ver], (ops, ver)
        # the restore itself is readable as history too
        assert (
            sorted(
                tuple(r)
                for r in V.read_versioned(spark, t, version=ver)
                .select("k", "v")
                .collect()
            )
            == states[ver]
        )


def test_rollback_of_restore_keeps_referenced_files(spark, lake):
    """_rollback on a restore head must remove only the log entry —
    the files it references belong to older versions."""
    V.restore_versioned(lake, 0)  # v1
    V._rollback(lake, 1)
    assert V.latest_version(lake) == 0
    assert V.read_versioned(spark, lake).count() == 100  # v0 intact
