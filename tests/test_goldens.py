"""Golden-trace pins for the iterative loops.

kmeans_embeddings (float Lloyd, library-only since round 7 — its
registry seat went to the decimal-exact kmeans_exact_lloyd) has no SQL
oracle; bpe_train gained its unrolled-CTE oracle in round 7 but keeps
this pin as defense in depth.  Their primary correctness pins are the
cross-implementation tests (numpy Lloyd in test_analytics2, sequential
Python BPE in test_trainprep).  Those recompute the expected trace
in-session, so a library bump that shifts BOTH implementations the
same way would pass silently.  These tests compare against traces
committed at generation time (scripts/make_goldens.py) — a
deterministic secondary check across sessions and environments.
"""

from __future__ import annotations

import json
import os

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _load(name):
    with open(os.path.join(GOLDEN_DIR, name)) as fh:
        return json.load(fh)


def test_kmeans_matches_golden_trace(spark):
    from f1_data_engineering_spark.operators import similarity as SIM

    g = _load("kmeans_sf0.001.json")
    got = sorted(
        (
            {
                "cluster": r["cluster"],
                "n_vectors": r["n_vectors"],
                "inertia": round(r["inertia"], 6),
            }
            for r in SIM.kmeans_embeddings(spark, g["sf_dir"]).collect()
        ),
        key=lambda d: d["cluster"],
    )
    exp = g["rows"]
    assert [r["cluster"] for r in got] == [r["cluster"] for r in exp]
    assert [r["n_vectors"] for r in got] == [r["n_vectors"] for r in exp]
    for a, b in zip(got, exp):
        # float-sum order can differ across partitionings; the trace is
        # pinned to 1e-6 relative — real drift (different assignment)
        # moves inertia by orders of magnitude more
        assert abs(a["inertia"] - b["inertia"]) <= 1e-6 * max(1.0, abs(b["inertia"]))


def test_bpe_matches_golden_trace(spark):
    from f1_data_engineering_spark.operators import trainprep as TP

    g = _load("bpe_sf0.001.json")
    got = sorted(
        (
            {
                "rank": r["rank"],
                "pair": r["pair"],
                "merged": r["merged"],
                "weighted_count": r["weighted_count"],
            }
            for r in TP.bpe_train(spark, g["sf_dir"], n_merges=g["n_merges"]).collect()
        ),
        key=lambda d: d["rank"],
    )
    assert got == g["rows"]
