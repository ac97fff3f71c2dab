"""Incremental dedup index (operators/incremental_dedup.py): pair
outputs across advances must union to the one-shot full-corpus result,
and each advance must hash only the delta."""

from __future__ import annotations

import pyspark.sql.functions as F

from f1_data_engineering_spark.operators import incremental_dedup as ID
from f1_data_engineering_spark.operators.dedup import (
    band_keys_df,
    estimate_pairs,
    signatures_df,
)
from f1_data_engineering_spark.sources import versioned as V
from f1_data_engineering_spark.sources.registry import load_table


def _full_pairs(spark, corpus_path, threshold=0.5):
    """One-shot reference: all near-dup pairs over the full corpus."""
    docs = V.read_versioned(spark, corpus_path).select("doc_id", "text")
    sig = signatures_df(docs).cache()
    bands = band_keys_df(sig)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    return estimate_pairs(cand, sig).filter(F.col("est_jaccard") >= threshold)


def _pairs_set(df):
    return {(r["d1"], r["d2"], r["est_jaccard"]) for r in df.collect()}


def test_incremental_pairs_union_to_full_recompute(spark, sf_dir, tmp_path):
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "sig_index")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # batch 1: even doc_ids.  batch 2: odd doc_ids + near-dups of five
    # batch-1 docs (truncated copies, cross-batch near-dup pairs).
    b1 = docs.filter("doc_id % 2 = 0")
    near = (
        docs.filter("doc_id % 2 = 0")
        .filter("doc_id < 10")
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.col("text")
            .substr(F.lit(1), ((F.length("text") * 4) / 5).cast("int"))
            .alias("text"),
        )
    )
    b2 = docs.filter("doc_id % 2 = 1").unionByName(near)

    V.write_versioned(b1, corpus, "overwrite")
    p1 = _pairs_set(ID.advance_dedup_index(spark, corpus, index))
    assert ID.index_base_version(spark, index) == 0

    V.write_versioned(b2, corpus, "append")
    p2 = _pairs_set(ID.advance_dedup_index(spark, corpus, index))
    assert ID.index_base_version(spark, index) == 1

    full = _pairs_set(_full_pairs(spark, corpus))
    assert p1 | p2 == full
    assert p1 & p2 == set()  # advances never re-emit a pair
    # the planted cross-batch near-dups were found by the SECOND advance
    planted = {p for p in p2 if p[1] >= 1000000}
    assert len(planted) >= 5


def test_advance_is_noop_when_current(spark, sf_dir, tmp_path):
    corpus = str(tmp_path / "corpus2")
    index = str(tmp_path / "sig_index2")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    V.write_versioned(docs, corpus, "overwrite")
    ID.advance_dedup_index(spark, corpus, index)
    again = ID.advance_dedup_index(spark, corpus, index)
    assert again.count() == 0
    assert V.latest_version(index) == 0  # no second index version


def test_overwrite_triggers_index_rebuild(spark, sf_dir, tmp_path):
    corpus = str(tmp_path / "corpus3")
    index = str(tmp_path / "sig_index3")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    V.write_versioned(docs.filter("doc_id % 2 = 0"), corpus, "overwrite")
    ID.advance_dedup_index(spark, corpus, index)

    V.write_versioned(docs.filter("doc_id % 2 = 1"), corpus, "overwrite")
    pairs = _pairs_set(ID.advance_dedup_index(spark, corpus, index))
    # rebuilt index covers exactly the new snapshot
    idx = V.read_versioned(spark, index)
    n_docs = docs.filter("doc_id % 2 = 1").count()
    assert idx.count() == n_docs
    assert pairs == _pairs_set(_full_pairs(spark, corpus))
