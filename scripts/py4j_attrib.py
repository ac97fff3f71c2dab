"""Attribute py4j round trips to engine source lines.

    python scripts/py4j_attrib.py <sf_dir> <query> [top_n]
"""

from __future__ import annotations

import collections
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from f1_data_engineering_spark.session import get_spark

from py4j.java_gateway import GatewayClient

_by_site: collections.Counter = collections.Counter()
_orig = GatewayClient.send_command
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_enabled = {"on": False}


def _counting(self, *a, **kw):
    if _enabled["on"]:
        site = "?"
        for frame in reversed(traceback.extract_stack()):
            fn = frame.filename
            if fn.startswith(_ROOT) and "/scripts/" not in fn:
                site = f"{os.path.relpath(fn, _ROOT)}:{frame.lineno} {frame.name}"
                break
        _by_site[site] += 1
    return _orig(self, *a, **kw)


GatewayClient.send_command = _counting


def main() -> None:
    sf_dir, name = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="py4j-attrib", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    qs = entry_mod.queries()
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    _enabled["on"] = True
    df = qs[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    _enabled["on"] = False
    total = sum(_by_site.values())
    print(f"{name}: {total} py4j calls from engine code")
    for site, n in _by_site.most_common(top_n):
        print(f"{n:7d}  {site}")


if __name__ == "__main__":
    main()
