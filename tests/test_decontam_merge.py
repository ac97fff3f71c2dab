"""Benchmark decontamination (operators/decontam.py) and SCD2 merge
(operators/merge.py) invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_engineering_spark.operators import decontam as DC
from f1_data_engineering_spark.operators import merge as MG
from f1_data_engineering_spark.sources.registry import load_table


def test_decontam_ratios_bounded_and_train_only(spark, sf_dir):
    rows = DC.decontaminate_ngrams(spark, sf_dir).collect()
    for r in rows:
        assert r["doc_id"] % 50 != 0  # eval docs never flagged against themselves
        assert 1 <= r["n_hit"] <= r["n_grams"]
        assert 0.0 < r["overlap_ratio"] <= 1.0
        assert r["contaminated"] == (
            r["n_hit"] / r["n_grams"] >= DC.CONTAM_THRESHOLD
        )


def test_contamination_summary_consistent_with_per_doc(spark, sf_dir):
    per_doc = DC.decontaminate_ngrams(spark, sf_dir).collect()
    summary = DC.contamination_summary(spark, sf_dir).collect()
    n_train = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 50 != 0)
        .count()
    )
    assert sum(r["n_train_docs"] for r in summary) == n_train
    assert sum(r["n_overlapping"] for r in summary) == len(per_doc)
    assert sum(r["n_contaminated"] for r in summary) == sum(
        1 for r in per_doc if r["contaminated"]
    )


def test_scd2_exactly_one_current_row_per_key(spark, sf_dir):
    out = MG.scd2_customer_merge(spark, sf_dir)
    cur = out.filter("is_current").groupBy("c_custkey").count()
    assert cur.filter("count <> 1").count() == 0
    # every base customer survives the merge
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert out.select("c_custkey").distinct().count() >= n_cust


def test_scd2_closed_rows_match_changed_keys(spark, sf_dir):
    out = MG.scd2_customer_merge(spark, sf_dir).cache()
    closed = out.filter(~F.col("is_current"))
    # a closed row implies a newer open row for the same key, whose
    # valid_from equals the closed row's valid_to
    pair = closed.alias("c").join(
        out.filter("is_current").alias("o"), "c_custkey"
    )
    bad = pair.filter(F.col("c.valid_to") != F.col("o.valid_from")).count()
    assert bad == 0
    assert closed.filter(F.col("valid_to").isNull()).count() == 0
    out.unpersist()


def test_keep_canonical_keeps_originals(spark, sf_dir):
    """On the planted corpus every truncated copy (doc_id >= 1000000)
    loses to its longer original: no kept doc is a copy, and every
    cluster keeps exactly its longest member."""
    from f1_data_engineering_spark.operators import dedup as DD

    rows = DD.dedup_keep_canonical(spark, sf_dir).collect()
    assert rows
    assert all(r["kept_doc"] < 1000000 for r in rows)
    assert all(r["cluster_size"] >= 2 for r in rows)


def test_latest_event_state_is_true_argmax(spark, sf_dir):
    """Cross-check one user's snapshot against a direct sort."""
    from f1_data_engineering_spark.operators import timeops as TO
    from f1_data_engineering_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    rows = TO.latest_event_state(spark, sf_dir).collect()
    uid = rows[0]["user_id"]
    direct = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") == uid)
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .collect()
    )
    assert rows[0]["last_event_id"] == direct[0]["event_id"]
    assert rows[0]["n_events"] == len(direct)
