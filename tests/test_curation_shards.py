"""curation_shards_cdf (operators/curation_incremental.py): the
CDF-maintained training-shard manifest.  The registered query's oracle
certifies the end state; these tests pin the maintenance mechanics on
a small hand-built table — signed deltas across insert/delete/update
feeds, idempotent advances, and base_version bookkeeping."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_engineering_spark.operators.curation_incremental import (
    _advance_shard_manifest,
)
from f1_data_engineering_spark.operators.trainprep import _shard_col
from f1_data_engineering_spark.sources import dml as D
from f1_data_engineering_spark.sources import versioned as V


def _mk(spark, ids):
    return spark.createDataFrame(
        [(i, f"doc {i}", 10 + i % 5) for i in ids],
        "doc_id long, text string, n_tok long",
    )


def _scratch(spark, path):
    return {
        (r["shard"],): (r["n_docs"], r["total_tokens"])
        for r in V.read_versioned(spark, path)
        .select(_shard_col(), "n_tok")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
        .collect()
    }


def _maintained(spark, mpath):
    return {
        (r["shard"],): (r["n_docs"], r["total_tokens"])
        for r in V.read_versioned(spark, mpath).collect()
    }


def test_signed_deltas_across_dml(spark, tmp_path):
    t, m = str(tmp_path / "clean"), str(tmp_path / "manifest")
    V.write_versioned(_mk(spark, range(40)), t, mode="append")
    _advance_shard_manifest(spark, t, m)
    assert _maintained(spark, m) == _scratch(spark, t)
    V.write_versioned(_mk(spark, range(40, 70)), t, mode="append")
    D.delete_where(spark, t, "doc_id % 4 = 1", capture_cdf=True)
    D.update_where(
        spark, t, "doc_id % 5 = 0", {"n_tok": "n_tok + 3"}, capture_cdf=True
    )
    _advance_shard_manifest(spark, t, m)
    assert _maintained(spark, m) == _scratch(spark, t)


def test_advance_is_idempotent(spark, tmp_path):
    t, m = str(tmp_path / "clean"), str(tmp_path / "manifest")
    V.write_versioned(_mk(spark, range(25)), t, mode="append")
    _advance_shard_manifest(spark, t, m)
    v1 = V.latest_version(m)
    _advance_shard_manifest(spark, t, m)  # no new corpus versions
    assert V.latest_version(m) == v1  # no-op: nothing recommitted
    assert _maintained(spark, m) == _scratch(spark, t)


def test_base_version_tracks_head(spark, tmp_path):
    t, m = str(tmp_path / "clean"), str(tmp_path / "manifest")
    V.write_versioned(_mk(spark, range(20)), t, mode="append")
    _advance_shard_manifest(spark, t, m)
    V.write_versioned(_mk(spark, range(20, 30)), t, mode="append")
    _advance_shard_manifest(spark, t, m)
    base = (
        V.read_versioned(spark, m).agg(F.max("base_version")).first()[0]
    )
    assert base == V.latest_version(t) == 1
