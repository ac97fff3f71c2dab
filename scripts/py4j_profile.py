"""Profile plan-BUILD cost per query: py4j round trips + wall time to
construct the DataFrame (no action), vs execution time (noop sink).

Round-trip counts are deterministic (independent of box load); build
seconds are only meaningful on a quiet box.  Usage:

    python scripts/py4j_profile.py <sf_dir> q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from f1_data_engineering_spark.session import get_spark

from py4j.java_gateway import GatewayClient

_calls = {"n": 0}
_orig = GatewayClient.send_command


def _counting(self, *a, **kw):
    _calls["n"] += 1
    return _orig(self, *a, **kw)


GatewayClient.send_command = _counting


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="py4j-profile", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    qs = entry_mod.queries()
    # warm-up
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    for name in names:
        spark.catalog.clearCache()
        c0, t0 = _calls["n"], time.time()
        df = qs[name](spark, sf_dir)
        c1, t1 = _calls["n"], time.time()
        df.write.format("noop").mode("overwrite").save()
        c2, t2 = _calls["n"], time.time()
        print(
            f"{name}: build {t1 - t0:.2f}s / {c1 - c0} py4j calls ; "
            f"exec {t2 - t1:.2f}s / {c2 - c1} py4j calls",
            flush=True,
        )


if __name__ == "__main__":
    main()
