"""Incremental curation (operators/curation_incremental.py): equality
with the one-shot pipeline, delta-proportional advance cost, and the
cell index's quantizer-drift rebuild trigger."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from f1_data_engineering_spark.operators import curation as CU
from f1_data_engineering_spark.operators import curation_incremental as CI
from f1_data_engineering_spark.sources import versioned as V

SF = "/root/testdata/sf0.001"


def test_incremental_equals_oneshot_and_costs_delta(spark, tmp_path):
    work = str(tmp_path / "lake")
    inc = sorted(
        tuple(r)
        for r in CI.curation_pipeline_incremental(spark, SF, work_dir=work).collect()
    )
    one = sorted(
        tuple(r) for r in CU.curation_pipeline_semantic(spark, SF).collect()
    )
    assert inc == one

    # advance cost ∝ delta: each advance appended EXACTLY its delta's
    # signatures/cells — nothing was re-hashed or re-assigned
    corpus = CU._curation_corpus(spark, SF)
    n1 = corpus.filter(F.col("doc_id") % 3 != 2).count()
    n2 = corpus.filter(F.col("doc_id") % 3 == 2).count()
    sig_idx = V.read_versioned(spark, os.path.join(work, "sig_index"))
    per_version = {
        r["base_version"]: r["n"]
        for r in sig_idx.groupBy("base_version").agg(F.count("*").alias("n")).collect()
    }
    assert sorted(per_version.values()) == sorted([n1, n2])

    # cell index covers exactly the corpus docs that HAVE embeddings
    # (planted +1e6 docs have no embedding row), one row each, one
    # append per advance (no rebuild fired)
    from f1_data_engineering_spark.sources.registry import load_table

    cells = V.read_versioned(spark, os.path.join(work, "cell_index"))
    emb_ids = load_table(spark, SF, "embeddings").select(
        F.col("vec_id").alias("doc_id")
    )
    n_with_emb = corpus.join(emb_ids, "doc_id", "left_semi").count()
    assert cells.count() == n_with_emb
    assert cells.select("vec_id").distinct().count() == n_with_emb
    assert cells.select("base_version").distinct().count() == 2


def test_cell_index_advance_is_noop_when_current(spark, tmp_path):
    """Advancing an up-to-date cell index must write nothing: the
    index's latest version list is unchanged and no new base_version
    appears (the idempotence a scheduled maintenance job relies on)."""
    corpus_path = str(tmp_path / "corpus")
    cells_path = str(tmp_path / "cells")
    V.write_versioned(CU._curation_corpus(spark, SF), corpus_path, mode="append")
    CI.advance_cell_index(spark, SF, corpus_path, cells_path)
    v_before = V.latest_version(cells_path)
    n_before = V.read_versioned(spark, cells_path).count()

    CI.advance_cell_index(spark, SF, corpus_path, cells_path)  # no-op
    assert V.latest_version(cells_path) == v_before
    assert V.read_versioned(spark, cells_path).count() == n_before


def test_cell_index_rebuilds_on_quantizer_drift(spark, tmp_path):
    corpus_path = str(tmp_path / "corpus")
    cells_path = str(tmp_path / "cells")
    corpus = CU._curation_corpus(spark, SF)
    V.write_versioned(corpus, corpus_path, mode="append")

    # plant a stale-generation index: same rows, WRONG pinned nlist
    CI.advance_cell_index(spark, SF, corpus_path, cells_path)
    good = V.read_versioned(spark, cells_path)
    stale = good.withColumn("nlist", F.lit(2).cast("long")).withColumn(
        "base_version", F.lit(-1).cast("long")
    )
    V.write_versioned(stale, cells_path, mode="overwrite")

    # ANY new corpus version must now trigger a full rebuild under the
    # current √N rule (overwrite, single base_version = head)
    V.write_versioned(corpus.limit(0), corpus_path, mode="append")
    CI.advance_cell_index(spark, SF, corpus_path, cells_path)
    rebuilt = V.read_versioned(spark, cells_path)
    assert rebuilt.select("nlist").distinct().collect()[0][0] != 2
    assert rebuilt.select("base_version").distinct().count() == 1
    got = {
        (r["vec_id"], r["cell"]) for r in rebuilt.select("vec_id", "cell").collect()
    }
    want = {(r["vec_id"], r["cell"]) for r in good.select("vec_id", "cell").collect()}
    assert got == want
