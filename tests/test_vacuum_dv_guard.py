"""Vacuum/tombstone read-side guarantees (advice r9):

* a vacuumed DV that still APPLIES to a time-traveled snapshot must
  fail the read loudly instead of silently resurrecting deleted rows
  (the restore-resets-DV-state → vacuum → time-travel sequence);
* ``read_version_delta`` over a vacuumed append range raises the same
  clear vacuumed-range error as the change-feed readers;
* tombstones are per-vacuum fragments, so concurrent vacuums union
  instead of last-writer-wins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_spark.sources import dml as D
from f1_data_engineering_spark.sources import versioned as V


@pytest.fixture()
def lake(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    V.write_versioned(df.repartitionByRange(4, "k"), t, mode="overwrite")
    return t


def test_vacuumed_dv_still_applying_to_old_version_raises(spark, lake):
    """MoR delete → restore (resets DV state) → vacuum (collects the
    now-inert-in-retained-snapshots DV while its TARGET FILES stay
    alive, referenced by the restored head).  Time travel to the
    DV-era version must raise — silently skipping the vacuumed DV
    would resurrect the deleted rows."""
    D.delete_where_mor(spark, lake, "k < 10")  # v1: dv on v0's files
    assert V.read_versioned(spark, lake, version=1).count() == 90
    V.restore_versioned(lake, version=0)  # v2: head = v0 files, DVs reset
    deleted = V.vacuum(lake, retain_versions=0, min_age_seconds=0.0)
    dvs = [f for f in deleted if f.startswith("dv-")]
    assert dvs  # the sidecar was collectable (inert at the head)
    # head reads fine — the DV never applied there
    assert V.read_versioned(spark, lake).count() == 100
    # ... but v1 (where the DV bit) is no longer reconstructible
    with pytest.raises(ValueError, match="not reconstructible"):
        V.read_versioned(spark, lake, version=1)


def test_version_delta_over_vacuumed_range_raises_clearly(spark, lake):
    V.write_versioned(
        spark.range(100, 110).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        lake,
        mode="append",
    )  # v1
    V.write_versioned(
        spark.range(0, 5).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        lake,
        mode="overwrite",
    )  # v2
    assert V.vacuum(lake, retain_versions=0, min_age_seconds=0.0)
    with pytest.raises(ValueError, match="vacuum"):
        V.read_version_delta(spark, lake, 0, 1)


def test_tombstone_fragments_union_not_clobber(lake):
    """Two vacuums (or two CONCURRENT ones — fragments make the order
    irrelevant) must both be visible: the record is the union of
    per-vacuum fragment files, never a read-merge-rewrite of one
    shared file."""
    V._record_tombstones(lake, {"data-aaaa.parquet"})
    V._record_tombstones(lake, {"data-bbbb.parquet"})
    got = V._vacuum_tombstones(lake)
    assert {"data-aaaa.parquet", "data-bbbb.parquet"} <= got


def test_legacy_single_tombstone_file_still_read(lake):
    import json
    import os

    p = os.path.join(lake, V.LOG_DIR, "_vacuumed.json")
    with open(p, "w") as f:
        json.dump(["data-legacy.parquet"], f)
    V._record_tombstones(lake, {"data-new.parquet"})
    assert {"data-legacy.parquet", "data-new.parquet"} <= V._vacuum_tombstones(
        lake
    )
