"""Independent-reference semantic pins for the round-4 analytics wave.

The differential gate proves Spark == DuckDB; these tests prove the
SEMANTICS are right against brute-force / numpy / pandas references a
shared twin bug could not fool (the same pattern as
prefix_filter_jaccard's completeness proof vs brute force).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from f1_data_engineering_spark.operators import analytics3 as A3
from f1_data_engineering_spark.operators import textops as TX

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# pareto_frontier_orders vs O(n²) dominance brute force
# ---------------------------------------------------------------------------


def test_pareto_frontier_matches_bruteforce(spark):
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    got = A3.pareto_frontier_orders(spark, SF).toPandas()

    # brute force: per-date best price (min orderkey tie-break), then
    # O(days²) strict-dominance filter
    o = orders.copy()
    o["price"] = (o["o_totalprice"] * 100).round().astype("int64")  # exact cents
    champ = (
        o.sort_values(["o_orderdate", "price", "o_orderkey"],
                      ascending=[True, False, True])
        .groupby("o_orderdate", as_index=False)
        .first()[["o_orderdate", "o_orderkey", "price"]]
    )
    rows = champ.to_dict("records")
    frontier = [
        r for r in rows
        if not any(
            s["o_orderdate"] < r["o_orderdate"] and s["price"] >= r["price"]
            for s in rows
        )
    ]
    exp = {(r["o_orderdate"], r["o_orderkey"]): r["price"] for r in frontier}

    assert len(got) == len(exp)
    for _, g in got.iterrows():
        k = (g["o_orderdate"], g["o_orderkey"])
        assert k in exp, k
        assert round(g["best_price"] * 100) == exp[k], k
    # frontier prices strictly increase over date — the skyline invariant
    assert got["best_price"].is_monotonic_increasing
    assert got["best_price"].is_unique


# ---------------------------------------------------------------------------
# event_bigram_transitions: probability normalization + count conservation
# ---------------------------------------------------------------------------


def test_bigram_transitions_probabilities_and_mass(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    got = A3.event_bigram_transitions(spark, SF).toPandas()

    # per-src probabilities sum to 1 (within rounding of 6 dp per cell)
    sums = got.groupby("src_type")["p_trans"].sum()
    for src, s in sums.items():
        n_cells = (got["src_type"] == src).sum()
        assert abs(s - 1.0) <= n_cells * 1e-6, (src, s)

    # total transition mass = Σ_users (events_per_user − 1)
    per_user = ev.groupby("user_id").size()
    assert got["n_trans"].sum() == int((per_user - 1).sum())

    # pandas reference for the exact counts
    ev2 = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ev2["dst"] = ev2.groupby("user_id")["event_type"].shift(-1)
    ref = (
        ev2.dropna(subset=["dst"])
        .groupby(["event_type", "dst"])
        .size()
        .to_dict()
    )
    for _, g in got.iterrows():
        assert ref[(g["src_type"], g["dst_type"])] == g["n_trans"]


# ---------------------------------------------------------------------------
# first_touch_attribution: value conservation + channel assignment
# ---------------------------------------------------------------------------


def test_first_touch_attribution_conserves_purchase_value(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    got = A3.first_touch_attribution(spark, SF).toPandas()

    # every user appears under exactly one channel
    assert got["n_users"].sum() == ev["user_id"].nunique()
    # attributed value across channels == total purchase value (exact
    # to the DECIMAL(38,4) internal representation)
    total = ev.loc[ev["event_type"] == "purchase", "value"].round(4).sum()
    assert abs(got["attributed_value"].sum() - total) < 1e-6
    assert got["n_purchases"].sum() == int((ev["event_type"] == "purchase").sum())

    # channel = type of the (ts, event_id)-first event, pandas reference
    first = (
        ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        .groupby("user_id")
        .first()["event_type"]
    )
    ref_users = first.value_counts().to_dict()
    for _, g in got.iterrows():
        assert ref_users[g["channel"]] == g["n_users"], g["channel"]


# ---------------------------------------------------------------------------
# sliding_zscore_anomaly vs a pandas rolling reference
# ---------------------------------------------------------------------------


def test_sliding_zscore_matches_pandas_rolling(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    got = {
        (r["user_id"], r["event_id"]): r
        for _, r in A3.sliding_zscore_anomaly(spark, SF).toPandas().iterrows()
    }
    assert got, "no anomalies at sf0.001 — test is vacuous"

    flagged = {}
    for uid, grp in ev.sort_values(["ts", "event_id"], kind="mergesort").groupby(
        "user_id"
    ):
        window: list[int | None] = []
        for _, r in grp.iterrows():
            vc = (
                None
                if pd.isna(r["value"])
                else int(np.round(r["value"] * 100))
            )
            n = len(window)
            live = [v for v in window if v is not None]
            s, ss = sum(live), sum(v * v for v in live)
            if vc is not None and n >= A3._ZMIN and n * ss > s * s:
                z = (vc - s / n) / math.sqrt((ss - s * s / n) / (n - 1))
                if abs(round(z, 6)) > A3._ZTHRESH:
                    flagged[(uid, r["event_id"])] = (n, round(z, 6))
            window.append(vc)
            if len(window) > A3._ZWIN:
                window = window[-A3._ZWIN:]
    assert set(got) == set(flagged)
    for k, (n, z) in flagged.items():
        assert got[k]["n_prev"] == n
        assert abs(got[k]["zscore"] - z) <= 1e-9


# ---------------------------------------------------------------------------
# mad_outlier_events vs numpy median/MAD
# ---------------------------------------------------------------------------


def test_mad_outliers_match_numpy(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    got = A3.mad_outlier_events(spark, SF).toPandas().set_index("event_type")

    for etype, grp in ev.groupby("event_type"):
        v = grp["value"].to_numpy()
        med = round(float(np.percentile(v, 50, method="linear")), 6)
        mad = round(float(np.percentile(np.abs(v - med), 50, method="linear")), 6)
        g = got.loc[etype]
        assert g["n_events"] == len(v)
        assert abs(g["med_value"] - med) <= 1e-9, etype
        assert abs(g["mad_value"] - mad) <= 1e-9, etype
        assert g["n_outliers"] == int((np.abs(v - med) > 4.4478 * mad).sum()), etype


# ---------------------------------------------------------------------------
# token_entropy vs a collections.Counter reference
# ---------------------------------------------------------------------------


def test_token_entropy_matches_counter_reference(spark):
    from collections import Counter

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    got = TX.token_entropy(spark, SF).toPandas().set_index("doc_id")

    for _, d in docs.head(50).iterrows():
        toks = (d["text"] or "").lower().split()
        g = got.loc[d["doc_id"]]
        assert g["n_tokens"] == len(toks)
        if not toks:
            assert pd.isna(g["entropy"])
            continue
        cnt = Counter(toks)
        assert g["n_unique"] == len(cnt)
        n = len(toks)
        h = math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n
        assert abs(g["entropy"] - h) <= 5e-6  # 9-dp per-term rounding
        if len(cnt) > 1:
            assert abs(g["norm_entropy"] - h / math.log(len(cnt))) <= 5e-6


# ---------------------------------------------------------------------------
# term_cooccurrence_pmi vs a brute-force Counter reference
# ---------------------------------------------------------------------------


def test_term_pmi_matches_bruteforce(spark):
    from collections import Counter
    from itertools import combinations

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    got = TX.term_cooccurrence_pmi(spark, SF).toPandas()
    assert len(got) > 0

    doc_terms = [
        set((t or "").lower().split()) for t in docs["text"]
    ]
    dfreq = Counter(t for s in doc_terms for t in s)
    vocab = set(
        t for t, _ in sorted(dfreq.items(), key=lambda kv: (-kv[1], kv[0]))[
            : TX.PMI_VOCAB
        ]
    )
    pair_counts = Counter(
        p
        for s in doc_terms
        for p in combinations(sorted(s & vocab), 2)
    )
    n_docs = len(docs)
    for _, g in got.iterrows():
        pair = (g["term_a"], g["term_b"])
        assert dfreq[g["term_a"]] == g["n_a"]
        assert dfreq[g["term_b"]] == g["n_b"]
        assert pair_counts[pair] == g["n_ab"], pair
        pmi = math.log(g["n_ab"] * n_docs / (g["n_a"] * g["n_b"]))
        assert abs(g["pmi"] - pmi) <= 1e-6
    # output size and ordering invariants (exact top-30 sequence is
    # checked engine-vs-engine by the differential gate; here we pin
    # the semantics without re-deriving Spark's float rounding)
    n_support = sum(1 for c in pair_counts.values() if c >= TX.PMI_MIN_AB)
    assert len(got) == min(30, n_support)
    pmis = got["pmi"].tolist()
    assert pmis == sorted(pmis, reverse=True)
    # nothing below the cutoff sneaks in: every returned pmi must be ≥
    # the 30th-best exact pmi (tolerance for 6-dp rounding)
    exact = sorted(
        (
            math.log(c * n_docs / (dfreq[a] * dfreq[b]))
            for (a, b), c in pair_counts.items()
            if c >= TX.PMI_MIN_AB
        ),
        reverse=True,
    )
    if len(exact) >= len(got):
        assert min(pmis) >= exact[len(got) - 1] - 2e-6
