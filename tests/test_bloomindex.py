"""Per-file Bloom index (sources/bloomindex.py): no false negatives,
real file skipping on an unclustered key, incremental refresh across
DML, and DV-correct pruned reads."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_spark.sources import bloomindex as B
from f1_data_engineering_spark.sources import dml as D
from f1_data_engineering_spark.sources import versioned as V


@pytest.fixture()
def lake(spark, tmp_path):
    """1000 rows in 8 files, HASH-shuffled so min/max stats on k are
    useless (every file spans nearly the whole key range)."""
    t = str(tmp_path / "tbl")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("g"),
        (F.col("id") * 3).alias("v"),
    )
    V.write_versioned(df.repartition(8, "v"), t, mode="overwrite")
    return t


def test_bloom_prunes_and_never_false_negative(spark, lake):
    r = B.build_bloom_index(spark, lake, "k")
    assert r["indexed_now"] == 8
    pruned_counts = []
    for k in (0, 1, 137, 500, 999):
        df, scanned, total = B.read_versioned_bloom_pruned(spark, lake, "k", k)
        rows = df.collect()
        assert [x["k"] for x in rows] == [k]  # exact result survives pruning
        assert total == 8
        pruned_counts.append(scanned)
    # a point key lives in ONE file; with ~125 values/file at m=2^14
    # the FP rate is tiny — expect ~1 file scanned, allow FP slack
    assert max(pruned_counts) <= 3
    # a value NOT in the table: bloom proves absence almost everywhere
    df, scanned, total = B.read_versioned_bloom_pruned(spark, lake, "k", 10**9)
    assert df.count() == 0 and scanned <= 2


def test_min_max_stats_cannot_prune_this_layout(spark, lake):
    """The motivating contrast: on the hash-shuffled layout, manifest
    [min, max] skipping scans everything for the same point lookup."""
    _, scanned, total = V.read_versioned_pruned(spark, lake, "k", 137, 137)
    assert scanned == total == 8


def test_incremental_refresh_after_append_and_dml(spark, lake):
    B.build_bloom_index(spark, lake, "k")
    late = spark.range(2000, 2100).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("g"),
        (F.col("id") * 3).alias("v"),
    )
    V.write_versioned(late, lake, mode="append")
    D.update_where(spark, lake, "k % 100 = 7", {"v": "v + 1"})

    # unindexed new/rewritten files are conservatively scanned but the
    # result is still exact
    df, scanned, total = B.read_versioned_bloom_pruned(spark, lake, "k", 2050)
    assert [x["k"] for x in df.collect()] == [2050]
    assert scanned < total  # old indexed files still prune

    # refresh indexes ONLY the missing files
    before = json.loads(open(B._index_path(lake, "k")).read())["files"]
    r = B.build_bloom_index(spark, lake, "k")
    after = json.loads(open(B._index_path(lake, "k")).read())["files"]
    assert r["indexed_now"] > 0
    assert all(after[f] == bm for f, bm in before.items())  # old untouched
    df, scanned, total = B.read_versioned_bloom_pruned(spark, lake, "k", 2050)
    assert [x["k"] for x in df.collect()] == [2050] and scanned <= 3

    # updated row found through the rewritten (re-indexed) file
    df, _, _ = B.read_versioned_bloom_pruned(spark, lake, "k", 107)
    assert [(x["k"], x["v"]) for x in df.collect()] == [(107, 107 * 3 + 1)]


def test_bloom_pruned_read_applies_deletion_vectors(spark, lake):
    B.build_bloom_index(spark, lake, "k")
    D.delete_where_mor(spark, lake, "k = 137")
    df, scanned, total = B.read_versioned_bloom_pruned(spark, lake, "k", 137)
    assert df.count() == 0  # DV applied even on the pruned scan
    assert scanned <= 3  # and the bloom still pruned

    # neighbors still found
    df, _, _ = B.read_versioned_bloom_pruned(spark, lake, "k", 138)
    assert df.count() == 1


def test_string_keys_and_missing_index(spark, tmp_path):
    t = str(tmp_path / "s")
    df = spark.createDataFrame(
        [(f"user-{i}", i) for i in range(200)], "u string, n long"
    )
    V.write_versioned(df.repartition(4, "n"), t, mode="overwrite")
    # no index yet: scans all, still exact
    got, scanned, total = B.read_versioned_bloom_pruned(spark, t, "u", "user-55")
    assert got.count() == 1 and scanned == total == 4
    B.build_bloom_index(spark, t, "u")
    got, scanned, total = B.read_versioned_bloom_pruned(spark, t, "u", "user-55")
    assert got.count() == 1 and scanned <= 2


# ---------------------------------------------------------------------------
# property fuzz: no false negatives, exact results, for arbitrary tables
# ---------------------------------------------------------------------------

import os as _os

from hypothesis import HealthCheck, given, settings, strategies as st


def _n_examples(default: int) -> int:
    base = int(_os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "0"))
    return max(1, round(base * default / 8)) if base else default


_counter = [0]


@settings(
    max_examples=_n_examples(6),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.one_of(st.none(), st.integers(-50, 50)), min_size=1, max_size=60
    ),
    n_files=st.integers(1, 5),
    probes=st.lists(st.integers(-60, 60), min_size=1, max_size=6),
)
def test_bloom_lookup_fuzz_exactness(spark, tmp_path_factory, keys, n_files, probes):
    """For ANY table (NULL keys, duplicate keys, negative keys, single
    file) and ANY probe (present, absent, never-inserted-range): the
    bloom-pruned lookup must return exactly the full-scan filter's
    rows.  False negatives — the one thing a Bloom filter must never
    produce — would surface here as missing rows."""
    _counter[0] += 1
    t = str(tmp_path_factory.mktemp("bfz") / f"t{_counter[0]}")
    rows = [(k, i) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "k long, rid long")
    V.write_versioned(df.repartition(n_files), t, mode="overwrite")
    B.build_bloom_index(spark, t, "k")
    for p in probes:
        got, scanned, total = B.read_versioned_bloom_pruned(spark, t, "k", p)
        want = sorted(rid for k, rid in rows if k == p)
        assert sorted(x["rid"] for x in got.collect()) == want
        assert 0 <= scanned <= total


def test_build_merges_concurrent_publish(spark, lake, monkeypatch):
    """A manifest published by a concurrent builder between our
    initial load and our publish must survive the merge-then-publish
    step (advice r8): its entries for files we did not index ourselves
    are kept, not last-writer-wins dropped."""
    other = {
        "column": "k",
        "m": B.BLOOM_M,
        "k": B.BLOOM_K,
        "files": {"concurrent-writer.parquet": [0] * (B.BLOOM_M // 64)},
    }
    real_load = B._load_manifest
    calls = {"n": 0}

    def racing_load(path, column):
        calls["n"] += 1
        # 1st call (build start): nothing published yet; 2nd call
        # (pre-publish re-load): the other builder has won the race
        return None if calls["n"] == 1 else other
    monkeypatch.setattr(B, "_load_manifest", racing_load)
    B.build_bloom_index(spark, lake, "k")
    monkeypatch.setattr(B, "_load_manifest", real_load)

    man = B._load_manifest(lake, "k")
    assert "concurrent-writer.parquet" in man["files"]
    assert len(man["files"]) == 9  # 8 snapshot files + the merged one
    # and the merged manifest still prunes / answers exactly
    got, scanned, total = B.read_versioned_bloom_pruned(spark, lake, "k", 137)
    assert [x["k"] for x in got.collect()] == [137]


def test_multi_key_lookup_matches_per_key_union(spark, lake):
    """Batched lookup (round 9): one scan of the per-key-pruned file
    UNION must return exactly the concatenation of the per-key
    results, with a scan count no larger than the per-key total."""
    B.build_bloom_index(spark, lake, "k")
    keys = [0, 137, 500, 999, 10**9]  # four present + one absent
    per_key_rows = []
    per_key_scanned = 0
    for k in keys:
        df, scanned, total = B.read_versioned_bloom_pruned(spark, lake, "k", k)
        per_key_rows += [tuple(r) for r in df.collect()]
        per_key_scanned += scanned
    got, scanned, total = B.read_versioned_bloom_pruned_multi(
        spark, lake, "k", keys
    )
    assert sorted(tuple(r) for r in got.collect()) == sorted(per_key_rows)
    assert total == 8
    assert scanned <= min(per_key_scanned, total)  # union, never worse

    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        B.read_versioned_bloom_pruned_multi(spark, lake, "k", [])
