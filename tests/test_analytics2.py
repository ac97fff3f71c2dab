"""Funnel / count-min sketch / priority sampling / recursive CTE
(operators/analytics2.py).  Cross-engine value parity is pinned by the
DuckDB oracles; these tests pin the semantic properties."""

from __future__ import annotations

import pyspark.sql.functions as F

from f1_data_engineering_spark.operators import analytics2 as A2
from f1_data_engineering_spark.sources.registry import load_table


def test_funnel_stage_counts_are_monotone(spark, sf_dir):
    row = A2.event_funnel(spark, sf_dir).collect()[0]
    assert row["n_users"] >= row["n_view"] >= row["n_view_click"] >= row["n_full_funnel"]
    assert row["n_full_funnel"] > 0  # sf0.001+ has full conversions
    assert 0.0 <= row["rate_full"] <= row["rate_view_click"] <= 1.0


def test_funnel_requires_stage_order(spark, sf_dir):
    """A user whose only purchase precedes their first view must not
    count as a full conversion — compare against an unordered funnel."""
    ev = load_table(spark, sf_dir, "events")
    unordered = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.col("event_type") == "view").alias("v"),
            F.max(F.col("event_type") == "click").alias("c"),
            F.max(F.col("event_type") == "purchase").alias("p"),
        )
        .filter("v AND c AND p")
        .count()
    )
    ordered = A2.event_funnel(spark, sf_dir).collect()[0]["n_full_funnel"]
    assert ordered <= unordered


def test_cms_estimate_upper_bounds_true_count(spark, sf_dir):
    """The count-min guarantee: estimate(u) >= true_count(u), and the
    total mass in every sketch row equals the stream length."""
    ev = load_table(spark, sf_dir, "events")
    truth = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(truth.values())
    sketch = A2.countmin_sketch(spark, sf_dir).collect()
    per_depth = {}
    for r in sketch:
        per_depth[r["depth"]] = per_depth.get(r["depth"], 0) + r["n"]
    assert all(v == n_total for v in per_depth.values())
    for uid in list(truth)[:10]:
        est = A2.cms_point_estimate(spark, sf_dir, uid)
        assert est >= truth[uid]


def test_priority_sample_is_deterministic_topk(spark, sf_dir):
    got = A2.priority_sample_orders(spark, sf_dir)
    rows = got.collect()
    assert len(rows) == A2.PRIORITY_K
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, A2.PRIORITY_K + 1)
    )
    again = {r["o_orderkey"] for r in A2.priority_sample_orders(spark, sf_dir).collect()}
    assert again == {r["o_orderkey"] for r in rows}


def test_priority_sample_prefers_heavy_weights(spark, sf_dir):
    """Priority sampling inclusion probability rises with weight: the
    sampled orders' mean weight must exceed the population mean."""
    o = load_table(spark, sf_dir, "orders")
    pop_mean = o.agg(F.avg(F.col("o_totalprice").cast("double"))).collect()[0][0]
    rows = A2.priority_sample_orders(spark, sf_dir).collect()
    samp_mean = sum(r["weight"] for r in rows) / len(rows)
    assert samp_mean > pop_mean


def test_recursive_decay_matches_python_fold(spark, sf_dir):
    """The recursive CTE must equal a driver-side fold of the same
    per-user ordered purchase sequences (independent of both SQL
    engines)."""
    import math

    ev = load_table(spark, sf_dir, "events")
    seqs = {}
    for r in (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    ):
        seqs.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["value"]))
    expected = {}
    for uid, rows in seqs.items():
        state = None
        for _, _, v in sorted(rows, key=lambda t: (t[0], t[1])):
            v = v if v is not None else 0.0
            nxt = v if state is None else 0.9 * state + v
            state = math.floor(nxt * 1e6 + 0.5) / 1e6
        expected[uid] = (len(rows), state)
    got = {
        r["user_id"]: (r["n_events"], r["state"])
        for r in A2.decayed_value_recursive(spark, sf_dir).collect()
    }
    assert got == expected


def test_kmeans_matches_numpy_lloyd(spark, sf_dir):
    """kmeans_embeddings must agree with an independent numpy Lloyd
    implementation run from the same deterministic init for the same
    fixed iteration count: identical cluster sizes and inertia within
    float tolerance (centroid means sum in different orders)."""
    import numpy as np

    from f1_data_engineering_spark.operators import similarity as SIM

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    k, iters = SIM.KMEANS_K, SIM.KMEANS_ITERS
    cents = X[:k].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        labels = d2.argmin(axis=1)  # argmin ties -> lowest index, same rule
        for j in range(k):
            if (labels == j).any():
                cents[j] = X[labels == j].mean(axis=0)
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    labels = d2.argmin(axis=1)
    exp_sizes = {j: int((labels == j).sum()) for j in range(k) if (labels == j).any()}
    exp_inertia = {j: float(d2[labels == j, j].sum()) for j in exp_sizes}

    got = SIM.kmeans_embeddings(spark, sf_dir).collect()
    got_sizes = {r["cluster"]: r["n_vectors"] for r in got}
    assert got_sizes == exp_sizes
    for r in got:
        assert abs(r["inertia"] - exp_inertia[r["cluster"]]) < 1e-2 * max(
            1.0, exp_inertia[r["cluster"]]
        ) * 1e-4 + 1e-3, (r["cluster"], r["inertia"], exp_inertia[r["cluster"]])


def test_kmeans_inertia_decreases_over_iterations(spark, sf_dir):
    from f1_data_engineering_spark.operators import similarity as SIM

    def total(iters):
        rows = SIM.kmeans_embeddings(spark, sf_dir, iters=iters).collect()
        return sum(r["inertia"] for r in rows)

    t1, t3 = total(1), total(3)
    assert t3 <= t1 + 1e-6


def test_fuzzy_pairs_complete_vs_bruteforce(spark, sf_dir):
    """The deletion-neighborhood join must find EXACTLY the pairs a
    brute-force cross join with a levenshtein filter finds (distance-1
    recall is provable for SymSpell keys; this pins the implementation)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name"))
        .limit(200)
        .cache()
    )
    a, b = c.alias("a"), c.alias("b")
    brute = {
        (r["id1"], r["id2"])
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.levenshtein("a.name", "b.name").alias("d"),
        )
        .filter("d <= 1")
        .collect()
    }
    from f1_data_engineering_spark.operators.analytics2 import fuzzy_name_pairs

    ids = {r["id"] for r in c.select("id").collect()}
    got = {
        (r["id1"], r["id2"])
        for r in fuzzy_name_pairs(spark, sf_dir).collect()
        if r["id1"] in ids and r["id2"] in ids
    }
    assert got == brute
    c.unpersist()


def test_frequent_event_types_exact_at_low_cardinality(spark, sf_dir):
    from f1_data_engineering_spark.operators.analytics2 import frequent_event_types

    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .filter("event_type IS NOT NULL")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r["event_type"]: r["n"] for r in frequent_event_types(spark, sf_dir).collect()}
    assert got == exact


def test_kmeans_exact_planted_pairs(spark, tmp_path):
    """kmeans_exact_lloyd on 16 vectors forming 8 tight, well-separated
    pairs: init (the 8 lowest vec_ids) seeds one centroid per pair, so
    Lloyd converges to the pair means — every cluster keeps exactly its
    2 members and inertia is the hand-computed within-pair spread."""
    import numpy as np

    from f1_data_engineering_spark.operators import similarity as SIM

    dim, k = SIM.DIM, SIM.KMEANS_K
    rows = []
    for j in range(k):
        base = [0.0] * dim
        base[j] = 100.0 * (j + 1)  # pairs live far apart on distinct axes
        mate = list(base)
        mate[j] += 1.0  # the pair's second member, distance 1 away
        rows.append((j, [float(x) for x in base], 0))
        rows.append((k + j, [float(x) for x in mate], 0))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )

    got = {
        r["cluster"]: r
        for r in SIM.kmeans_exact_lloyd(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(range(k))
    for j in range(k):
        assert got[j]["n_vectors"] == 2, j
        # centroid = pair mean -> each member is 0.5 away on one axis:
        # inertia = 2 * 0.5^2 = 0.5
        assert got[j]["inertia"] == 0.5, (j, got[j]["inertia"])


def test_kmeans_exact_agrees_with_float_kmeans_on_fixture(spark, sf_dir):
    """The decimal-exact twin and the float kmeans_embeddings run the
    same algorithm up to centroid-mean rounding; on the test corpora
    the 6-dp mean rounding never flips an assignment, so cluster sizes
    match exactly and inertias agree to float tolerance."""
    from f1_data_engineering_spark.operators import similarity as SIM

    exact = {r["cluster"]: r for r in SIM.kmeans_exact_lloyd(spark, sf_dir).collect()}
    flt = {r["cluster"]: r for r in SIM.kmeans_embeddings(spark, sf_dir).collect()}
    assert {j: r["n_vectors"] for j, r in exact.items()} == {
        j: r["n_vectors"] for j, r in flt.items()
    }
    for j, r in exact.items():
        assert abs(r["inertia"] - flt[j]["inertia"]) <= 1e-3 * max(
            1.0, abs(flt[j]["inertia"])
        ), (j, r["inertia"], flt[j]["inertia"])
