"""Per-Spark-job wall-time breakdown of one query via the event log.

    python scripts/job_profile.py <sf_dir> <query>

Prints each job's duration, description, and the gaps between jobs
(driver-side time: planning, py4j, log parsing, commit bookkeeping).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from f1_data_engineering_spark.session import get_spark


def main() -> None:
    sf_dir, name = sys.argv[1], sys.argv[2]
    logdir = "/tmp/sparklog_profile"
    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="job-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
            "spark.eventLog.compress": "false",
        },
    )
    qs = entry_mod.queries()
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    spark.catalog.clearCache()
    time.sleep(0.5)
    t0 = time.time()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    total = time.time() - t0
    spark.stop()

    jobs: dict[int, dict] = {}
    paths = []
    for root, _dirs, files in os.walk(logdir):
        paths.extend(os.path.join(root, f) for f in files)
    for path in paths:
        base = os.path.basename(path)
        if "appstatus" in base or base.startswith("."):
            continue
        fh = open(path, errors="replace")
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if not isinstance(ev, dict):
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                props = ev.get("Properties", {}) or {}
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "desc": props.get(
                        "spark.job.description",
                        props.get("callSite.short", ""),
                    )[:90],
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["end"] = ev["Completion Time"]

    done = sorted(
        (jid, j) for jid, j in jobs.items() if "end" in j and "start" in j
    )
    # keep only jobs after the warm-up boundary: the profiled query is
    # the last contiguous run; find the first job whose start is after
    # the noop warm-up by looking at the biggest submission-time gap
    print(f"{name}: total {total:.2f}s, {len(done)} jobs in session")
    prev_end = None
    qjobs = [j for _, j in done if j["start"] >= (t0 * 1000 - 200)]
    run = 0.0
    for j in qjobs:
        dur = (j["end"] - j["start"]) / 1000
        gap = (j["start"] - prev_end) / 1000 if prev_end else 0.0
        prev_end = j["end"]
        run += dur
        print(f"  job {dur:7.2f}s  (gap {gap:6.2f}s)  {j['desc']}")
    print(f"  sum job time {run:.2f}s of {total:.2f}s wall "
          f"(driver-side {total - run:.2f}s)")


if __name__ == "__main__":
    main()
