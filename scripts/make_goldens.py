"""Regenerate the committed golden traces for the rows-only iterative
queries (kmeans_embeddings, bpe_train) at sf0.001.

These queries have no SQL oracle (driver records a rows-only check);
their primary pins are cross-implementation tests (numpy Lloyd,
sequential Python BPE).  The golden files add a cross-SESSION pin: a
pyspark/numpy/arrow version bump that silently changes the trace fails
tests/test_goldens.py even though both in-session implementations
drifted together.

Usage: python scripts/make_goldens.py   (run alone — see verify skill)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
)
SF_DIR = "/root/testdata/sf0.001"
BPE_MERGES = 6


def main() -> None:
    from f1_data_engineering_spark.operators import similarity as SIM
    from f1_data_engineering_spark.operators import trainprep as TP
    from f1_data_engineering_spark.session import get_spark

    spark = get_spark(app_name="make-goldens", master="local[8]", shuffle_partitions=8)
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    kmeans = sorted(
        (
            {
                "cluster": r["cluster"],
                "n_vectors": r["n_vectors"],
                "inertia": round(r["inertia"], 6),
            }
            for r in SIM.kmeans_embeddings(spark, SF_DIR).collect()
        ),
        key=lambda d: d["cluster"],
    )
    with open(os.path.join(GOLDEN_DIR, "kmeans_sf0.001.json"), "w") as fh:
        json.dump({"sf_dir": SF_DIR, "rows": kmeans}, fh, indent=1)

    bpe = [
        {
            "rank": r["rank"],
            "pair": r["pair"],
            "merged": r["merged"],
            "weighted_count": r["weighted_count"],
        }
        for r in TP.bpe_train(spark, SF_DIR, n_merges=BPE_MERGES).collect()
    ]
    bpe.sort(key=lambda d: d["rank"])
    with open(os.path.join(GOLDEN_DIR, "bpe_sf0.001.json"), "w") as fh:
        json.dump({"sf_dir": SF_DIR, "n_merges": BPE_MERGES, "rows": bpe}, fh, indent=1)

    print("goldens written to", GOLDEN_DIR)


if __name__ == "__main__":
    main()
