"""Run-determinism under different physical partitionings.

The repo's float-parity design rests on one claim: every aggregate
that feeds the differential gate is ORDER-INDEPENDENT (exact decimal
internals, deterministic tie-breaks), so the result is identical no
matter how Spark partitions the data — 3 shuffle partitions or 32,
one input split or many.  A plain double sum would break this (partial
merge order varies with partitioning) in exactly the way that only
shows up on a real cluster.  These tests change
``spark.sql.shuffle.partitions`` at runtime and re-run
float-producing queries, asserting BIT-IDENTICAL results.
"""

from __future__ import annotations

import pytest

#: Float-heavy queries spanning the aggregate/window/pair-join shapes.
#: (name kept for failure messages; import inside to reuse the session)
CASES = [
    ("q1_pricing_summary", "relational"),
    ("running_total", "relational"),
    ("revenue_by_nation", "relational"),
    ("dsir_importance_weights", "trainprep"),
    ("ngram_jaccard_pairs", "dedup"),
    ("f1_lap_telemetry_summary", "f1_fixture_queries"),
    # round-4 wave: decimal log-sum entropy, rolling integer-sum
    # z-scores, and two-stage rounded percentiles
    ("token_entropy", "textops"),
    ("sliding_zscore_anomaly", "analytics3"),
    ("mad_outlier_events", "analytics3"),
    # round-4b graph wave: the PageRank fixpoint is the strongest
    # order-independence claim in the repo — 10 chained double-sum
    # iterations, deterministic ONLY because every sum is a src-sorted
    # fold; semdedup's prune flag hinges on a rounded float MAX
    ("pagerank_nations", "graphops"),
    ("semdedup_prune", "similarity"),
    # round-4c: BFS frontier order and star-contraction round order
    # must not leak into results; shard manifest is pure hash+agg
    ("bfs_hops_trade", "graphops"),
    ("cc_star_contraction", "graphops"),
    ("training_shard_manifest", "trainprep"),
    # round-5 wave: HLL estimates hinge on a bucket-sorted 2^-m fold;
    # winsorization on driver-collected rank offsets + a value-sorted
    # fold; the recall audit on 9-dp-rounded scoring keys; entity
    # labels on the contraction fixpoint — all must survive any
    # physical partitioning
    ("hll_distinct_users", "analytics4"),
    ("hll_intersection_estimate", "analytics4"),
    ("winsorized_stats", "analytics4"),
    ("ann_recall_eval", "similarity"),
    ("entity_resolution_clusters", "analytics4"),
    ("curation_pipeline_semantic", "curation"),
    # round-6 wave: moments ride a TWO-LEVEL sorted fold (bucket order
    # then group order); KMV estimates hinge on exact bottom-K ranks;
    # the PPS sample on an integer cumsum over broadcast bucket
    # offsets; the incremental merge on associative decimal adds; the
    # checksum is the order-independence claim ITSELF (a commutative
    # decimal sum); G² on integer-derived ln() ratios
    ("moment_stats", "analytics5"),
    ("kmv_set_ops", "analytics5"),
    ("weighted_systematic_sample", "analytics5"),
    ("incremental_rollup_merge", "analytics6"),
    ("table_checksum", "integrity"),
    ("keyness_g2", "textops"),
    ("lsh_recall_audit", "dedup"),
    # round-7 wave: the md5-HLL sketch profile rides the bucket-sorted
    # fold + exact lerp percentiles; the ANN fast path's BLAS prune
    # happens per ARROW BATCH (the partitioning-dependent unit) so the
    # exact rescore must erase any batch-shape effect; CUSUM's ordered
    # prefix sums are integers but the windows shuffle; the encode
    # ratio is an integer-ratio 6-dp round
    ("sketch_summary", "profiling"),
    # _500 = the registered shape: BLAS pinned (the default 5-query
    # call auto-dispatches to the exact fold and wouldn't exercise the
    # batch-shape-sensitive prune at all)
    ("ann_topk_vectorized_500", "similarity"),
    ("cusum_event_drift", "analytics7"),
    ("bpe_encode_corpus", "trainprep"),
]


def _rows_key(df):
    """Fully-materialized, order-insensitive, exact representation.

    NULL cells sort via an (is_null, value) surrogate — tuple
    comparison decides on the flag before ever comparing None to a
    value, so NULL-bearing columns (e.g. semdedup's cell-leader
    max_prior_sim) don't TypeError the sort; equality is still exact.
    """
    cols = sorted(df.columns)
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    return sorted(
        rows, key=lambda t: tuple((v is None, 0 if v is None else v) for v in t)
    )


@pytest.mark.parametrize("name,mod", CASES)
def test_result_invariant_to_shuffle_partitioning(spark, sf_dir, name, mod):
    import importlib

    fn = getattr(
        importlib.import_module(f"f1_data_engineering_spark.operators.{mod}"),
        name,
    )
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows_key(fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = _rows_key(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b, f"{name}: result depends on shuffle partitioning"
