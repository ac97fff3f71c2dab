"""Independent-reference semantic pins for the round-5 analytics wave
(analytics4.py): HyperLogLog vs a pure-Python sketch, salted join ≡
plain join in-engine, equi-depth bins vs pandas NTILE brute force,
skew profile vs value_counts, entity resolution vs a union-find brute
force with a DP edit distance.

The differential gate proves Spark == DuckDB; these prove the
SEMANTICS against references a shared twin bug could not fool.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from f1_data_engineering_spark.operators import analytics4 as A4

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# hll_distinct_users vs a pure-Python HyperLogLog
# ---------------------------------------------------------------------------


def _py_hll(keys) -> tuple[dict[int, int], float]:
    """Registers + raw estimate, straight from the 2007 paper with the
    repo's 60-bit md5 hash scheme."""
    regs: dict[int, int] = {}
    for k in set(keys):
        h = int(hashlib.md5(f"hll#{k}".encode()).hexdigest()[:15], 16)
        b, w = h % A4.HLL_M, h // A4.HLL_M
        rho = (A4.HLL_RHO_BITS + 1) if w == 0 else (
            A4.HLL_RHO_BITS + 1 - w.bit_length()
        )
        regs[b] = max(regs.get(b, 0), rho)
    s = float(A4.HLL_M - len(regs))
    for b in sorted(regs):
        s += 1.0 / float(1 << regs[b])
    return regs, A4.HLL_ALPHA * A4.HLL_M * A4.HLL_M / s


def test_hll_matches_python_sketch(spark):
    got = A4.hll_distinct_users(spark, SF).toPandas().set_index("group_key")
    ev = pd.read_parquet(f"{SF}/events.parquet")[["event_type", "user_id"]]
    ev = ev[ev.user_id.notna()]
    ev["g"] = ev.event_type.fillna("none")

    all_regs: dict[str, dict[int, int]] = {}
    for g, grp in ev.groupby("g"):
        regs, est = _py_hll(str(int(u)) for u in grp.user_id)
        all_regs[g] = regs
        row = got.loc[g]
        assert row["n_buckets_used"] == len(regs), g
        assert abs(row["hll_estimate"] - round(est, 6)) < 1e-9, g
        exact = grp.user_id.nunique()
        assert row["exact_distinct"] == exact
        # raw estimator only (documented contract — no small-range
        # correction, so sf0.001's ~15-user groups sit at the known
        # n≪m bias plateau of ~αm): pin the error ARITHMETIC, not an
        # accuracy bound
        assert abs(
            row["rel_err"] - round(abs(row["hll_estimate"] - exact) / exact, 6)
        ) < 1e-9, g

    # the merged row must equal the register-wise MAX sketch — the
    # mergeability contract — and estimate the distinct of the UNION
    merged: dict[int, int] = {}
    for regs in all_regs.values():
        for b, m in regs.items():
            merged[b] = max(merged.get(b, 0), m)
    s = float(A4.HLL_M - len(merged)) + sum(
        1.0 / float(1 << merged[b]) for b in sorted(merged)
    )
    est = A4.HLL_ALPHA * A4.HLL_M * A4.HLL_M / s
    row = got.loc["__merged"]
    assert row["n_buckets_used"] == len(merged)
    assert abs(row["hll_estimate"] - round(est, 6)) < 1e-9
    assert row["exact_distinct"] == ev.user_id.nunique()


# ---------------------------------------------------------------------------
# skew_join_salted ≡ the plain unsalted join, in-engine
# ---------------------------------------------------------------------------


def test_salted_join_equals_plain_join(spark):
    got = A4.skew_join_salted(spark, SF).toPandas()

    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_custkey", "o_totalprice"]]
    c = pd.read_parquet(f"{SF}/customer.parquet")[["c_custkey", "c_mktsegment"]]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j.o_totalprice * 100).round().astype("int64")
    exp = (
        j.groupby("c_mktsegment")
        .agg(n_orders=("cents", "size"), cents=("cents", "sum"))
        .reset_index()
        .sort_values("c_mktsegment")
    )
    assert list(got.c_mktsegment) == list(exp.c_mktsegment)
    assert list(got.n_orders) == list(exp.n_orders)
    for g, e in zip(got.itertuples(), exp.itertuples()):
        assert abs(g.total_revenue - e.cents / 100) < 1e-6
        assert abs(g.avg_order_value - round(e.cents / 100 / e.n_orders, 6)) < 1e-9

    # the salt must actually reach the join: its equi-key list carries
    # both custkey and salt
    plan = A4.skew_join_salted(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "salt" in plan


# ---------------------------------------------------------------------------
# equidepth_bins vs pandas NTILE brute force
# ---------------------------------------------------------------------------


def test_equidepth_bins_match_bruteforce(spark):
    got = A4.equidepth_bins(spark, SF).toPandas()
    o = (
        pd.read_parquet(f"{SF}/orders.parquet")[["o_orderkey", "o_totalprice"]]
        .sort_values(["o_totalprice", "o_orderkey"])
        .reset_index(drop=True)
    )
    n, k = len(o), A4.NTILE_K
    q, r = n // k, n % k
    sizes = [q + 1] * r + [q] * (k - r)
    assert list(got.n_orders) == sizes
    assert list(got.bin) == list(range(1, k + 1))
    # bin boundaries: min/max of each contiguous run of the sort
    pos = 0
    for row, size in zip(got.itertuples(), sizes):
        chunk = o.iloc[pos : pos + size]
        assert row.min_price == chunk.o_totalprice.min()
        assert row.max_price == chunk.o_totalprice.max()
        cents = (chunk.o_totalprice * 100).round().astype("int64").sum()
        assert abs(row.avg_price - round(cents / 100 / size, 6)) < 1e-9
        pos += size
    # scale-safety: no empty-frame global window (every Window in the
    # plan is partitioned by __pid)
    plan = A4.equidepth_bins(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "partitionrangeexchange" in plan.lower() or "rangepartitioning" in plan.lower()


def test_global_rank_by_range_is_exact_permutation(spark):
    from f1_data_engineering_spark.sources.registry import load_table

    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    ranked, n = A4.global_rank_by_range(o, ["o_totalprice", "o_orderkey"], parts=7)
    df = ranked.toPandas().sort_values("rank").reset_index(drop=True)
    assert n == len(df)
    assert list(df["rank"]) == list(range(1, n + 1))
    exp = df.sort_values(["o_totalprice", "o_orderkey"]).reset_index(drop=True)
    assert list(exp["rank"]) == list(range(1, n + 1))


# ---------------------------------------------------------------------------
# skew_profile vs pandas value_counts
# ---------------------------------------------------------------------------


def test_skew_profile_matches_pandas(spark):
    got = A4.skew_profile(spark, SF).toPandas().set_index("keyspace")
    for table, key in A4.SKEW_KEYSPACES:
        s = pd.read_parquet(f"{SF}/{table}.parquet")[key].dropna()
        vc = s.value_counts()
        row = got.loc[f"{table}.{key}"]
        assert row["n_keys"] == len(vc)
        assert row["n_rows"] == len(s)
        assert row["max_cnt"] == vc.max()
        # hottest key, ties to the smallest key value
        top = min(k for k, v in vc.items() if v == vc.max())
        assert row["top_key"] == str(top)
        avg = round(len(s) / len(vc), 6)
        assert abs(row["avg_per_key"] - avg) < 1e-9
        assert abs(row["skew_ratio"] - round(vc.max() / avg, 6)) < 1e-9


# ---------------------------------------------------------------------------
# entity_resolution_clusters vs union-find brute force
# ---------------------------------------------------------------------------


def _edit1(a: str, b: str) -> bool:
    """Edit distance ≤ 1 (DP-free special case)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def test_entity_resolution_matches_union_find(spark):
    got = A4.entity_resolution_clusters(spark, SF).toPandas()
    c = pd.read_parquet(f"{SF}/customer.parquet")[
        ["c_custkey", "c_name", "c_mktsegment"]
    ]
    recs = list(c.itertuples(index=False))

    parent = {r.c_custkey: r.c_custkey for r in recs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(recs):
        for b in recs[i + 1 :]:
            if (
                (a.c_mktsegment == b.c_mktsegment
                 or (pd.isna(a.c_mktsegment) and pd.isna(b.c_mktsegment)))
                and _edit1(a.c_name, b.c_name)
            ):
                ra, rb = find(a.c_custkey), find(b.c_custkey)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)

    clusters: dict[int, list[int]] = {}
    for r in recs:
        clusters.setdefault(find(r.c_custkey), []).append(r.c_custkey)
    names = dict(zip(c.c_custkey, c.c_name))

    assert len(got) == len(clusters)
    assert got.n_records.sum() == len(recs)  # full partition, singletons too
    for row in got.itertuples():
        members = sorted(clusters[row.entity_id])
        assert row.entity_id == members[0]  # label is the component min
        assert row.n_records == len(members)
        assert row.member_ids == ",".join(str(m) for m in members)
        assert row.canonical_name == names[row.entity_id]


# ---------------------------------------------------------------------------
# round-5b wave
# ---------------------------------------------------------------------------


def test_hll_intersection_matches_python_inclusion_exclusion(spark):
    got = A4.hll_intersection_estimate(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")[["event_type", "user_id"]]
    ev = ev[ev.user_id.notna()]
    ev["g"] = ev.event_type.fillna("none")
    keys = {
        g: {str(int(u)) for u in grp.user_id} for g, grp in ev.groupby("g")
    }

    def est_of(ks):
        regs, est = _py_hll(ks)
        return est

    assert len(got) == len(keys) * (len(keys) - 1) // 2
    for row in got.itertuples():
        a, b = keys[row.type_a], keys[row.type_b]
        ea, eb, eu = est_of(a), est_of(b), est_of(a | b)
        assert abs(row.est_a - round(ea, 6)) < 1e-9
        assert abs(row.est_b - round(eb, 6)) < 1e-9
        assert abs(row.est_union - round(eu, 6)) < 1e-9
        assert abs(row.est_intersection - round(ea + eb - eu, 6)) < 1e-9
        assert row.exact_intersection == len(a & b)


def test_ann_recall_eval_consistent_with_components(spark):
    from f1_data_engineering_spark.operators import similarity as SIM
    import numpy as np

    got = A4_spark = None
    got = SIM.ann_recall_eval(spark, SF).toPandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    V = np.stack(emb.embedding.to_numpy())
    ids = emb.vec_id.to_numpy()
    norms = np.sqrt((V * V).sum(axis=1))

    ivf = SIM.ivf_ann(spark, SF).toPandas()
    per_q = got[got.query_id >= 0].set_index("query_id")
    for qid in ids[ids % 100 == 0]:
        qi = np.where(ids == qid)[0][0]
        denom = norms[qi] * norms
        with np.errstate(invalid="ignore", divide="ignore"):
            sims = np.where(denom > 0, V @ V[qi] / denom, -2.0)
        sims = np.round(sims, 9)
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != qid),
            key=lambda i: (-sims[i], ids[i]),
        )
        exact = {int(ids[i]) for i in order[: SIM.IVF_TOPK]}
        approx = set(ivf[ivf.query_id == qid].neighbor_id.astype(int))
        row = per_q.loc[qid]
        assert row["n_exact"] == len(exact)
        assert row["n_hits"] == len(exact & approx), qid
    ov = got[got.query_id == -1].iloc[0]
    assert ov["n_exact"] == per_q["n_exact"].sum()
    assert ov["n_hits"] == per_q["n_hits"].sum()


def test_winsorized_stats_match_numpy(spark):
    import numpy as np

    got = A4.winsorized_stats(spark, SF).toPandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet")[["event_type", "value"]]
    ev = ev[ev.value.notna()]
    ev["g"] = ev.event_type.fillna("none")
    for g, grp in ev.groupby("g"):
        vals = np.sort(grp.value.to_numpy())
        p01 = np.quantile(vals, A4.WINS_LO, method="linear")
        p99 = np.quantile(vals, A4.WINS_HI, method="linear")
        w = np.clip(vals, p01, p99)
        row = got.loc[g]
        assert row["n_values"] == len(vals)
        assert abs(row["p01"] - round(float(p01), 6)) < 1e-6
        assert abs(row["p99"] - round(float(p99), 6)) < 1e-6
        assert row["n_clamped_low"] == int((vals < p01).sum())
        assert row["n_clamped_high"] == int((vals > p99).sum())
        assert abs(row["wins_mean"] - w.mean()) < 1e-6
        assert abs(row["wins_std"] - w.std()) < 1e-6


def test_negative_sampling_matches_bruteforce(spark):
    got = A4.negative_sampling_pairs(spark, SF).toPandas()
    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_orderkey", "o_custkey"]]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    parts = pd.read_parquet(f"{SF}/part.parquet")["p_partkey"]
    cust = pd.read_parquet(f"{SF}/customer.parquet")["c_custkey"]

    pos = (
        o.merge(li, left_on="o_orderkey", right_on="l_orderkey")[
            ["o_custkey", "l_partkey"]
        ]
        .drop_duplicates()
        .groupby("o_custkey")["l_partkey"]
        .apply(set)
        .to_dict()
    )
    max_pos = max((len(s) for s in pos.values()), default=0)
    hashed = sorted(
        (
            (int(hashlib.md5(f"neg#{p}".encode()).hexdigest()[:15], 16), int(p))
            for p in parts
        )
    )
    pool = hashed[: A4.NEG_K + max_pos]
    anchors = sorted(int(c) for c in cust if c % A4.NEG_ANCHOR_MOD == 0)

    exp = []
    for a in anchors:
        taken = 0
        for h, p in pool:
            if p in pos.get(a, ()):  # positives excluded
                continue
            taken += 1
            exp.append((a, taken, p))
            if taken == A4.NEG_K:
                break
    assert [tuple(r) for r in got.itertuples(index=False)] == exp
    # every anchor got its full K — the pool-size guarantee
    assert len(exp) == len(anchors) * A4.NEG_K


def test_hll_registers_merge_incrementally(spark):
    """Mergeability at the maintenance level: registers built on a
    NEW batch merge into standing registers by groupBy-MAX, and the
    merged sketch is IDENTICAL to a from-scratch build over the union
    — the property that makes per-day sketch tables answer range
    queries without rescanning raw data."""
    from pyspark.sql import functions as F
    from f1_data_engineering_spark.sources.registry import load_table

    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            F.coalesce(F.col("event_type"), F.lit("none")).alias("g"),
            F.col("user_id").cast("string").alias("k"),
            "event_id",
        )
    )

    def regs_of(df):
        h = A4._hll_hash(F.col("k"))
        w = F.floor(h / A4.HLL_M).cast("long")
        rho = F.when(w == 0, F.lit(A4.HLL_RHO_BITS + 1)).otherwise(
            F.lit(A4.HLL_RHO_BITS + 1) - F.length(F.bin(w))
        )
        return (
            df.select("g", (h % A4.HLL_M).alias("bucket"), rho.alias("rho"))
            .groupBy("g", "bucket")
            .agg(F.max("rho").alias("m"))
        )

    old = regs_of(ev.filter(F.col("event_id") % 2 == 0))
    new = regs_of(ev.filter(F.col("event_id") % 2 == 1))
    merged = (
        old.unionByName(new).groupBy("g", "bucket").agg(F.max("m").alias("m"))
    )
    full = regs_of(ev)
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_column_ndv_matches_python_sketch(spark):
    got = A4.column_ndv_sketches(spark, SF).toPandas().set_index("column_name")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    assert set(got.index) == set(A4.NDV_COLUMNS)
    for c in A4.NDV_COLUMNS:
        keys = {str(v) for v in o[c].dropna()}
        regs, est = _py_hll(keys)
        row = got.loc[c]
        assert row["n_buckets_used"] == len(regs), c
        assert abs(row["ndv_estimate"] - round(est, 6)) < 1e-9, c
        assert row["exact_ndv"] == len(keys), c
