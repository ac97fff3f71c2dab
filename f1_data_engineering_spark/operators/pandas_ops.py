"""Pandas-UDF-backed operators — the sanctioned Python escape hatch.

Policy (SURVEY.md §2.10): zero Python UDFs on the reference-parity
path; when Python is genuinely needed (stats libraries, model
inference, codecs) it runs as Arrow-batched grouped/iterator UDFs —
one (de)serialization per column batch, never per row.

``zscore_by_user`` exists to exercise and test that machinery on a
semantics-simple operator whose result a SQL oracle can replicate.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.registry import load_table

__all__ = ["zscore_by_user"]

_ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


#: Grouping granularity for the packed grouped-map: many users hash
#: into one bucket so each Python call sees a LARGE Arrow batch and
#: amortizes per-call overhead.  Scale rule: buckets ≈ a few × total
#: executor cores (small enough that a bucket's rows fit in executor
#: memory, large enough for full parallelism).
_ZSCORE_BUCKETS = 64


def _zscore_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user z-score (sample std, ddof=1) for EVERY user in the
    bucket, vectorized with one pandas groupby; degenerate (n=1 or
    zero-variance) groups → NULL."""
    g = pdf.groupby("user_id")["value"]
    mu = g.transform("mean")
    sd = g.transform("std")  # ddof=1
    z = ((pdf["value"] - mu) / sd).round(6)
    z[sd.isna() | (sd == 0)] = None
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "zscore": z}
    )


def zscore_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score of event value via ``applyInPandas``.

    Plan: one shuffle on a BUCKET of user_ids → each bucket becomes one
    Arrow batch through Python → per-user stats computed with a
    vectorized pandas groupby inside the batch → results stream back
    columnar.

    Why bucketed, not per-user groups: applyInPandas invokes the Python
    function once per group, so thousands of small groups pay per-call
    overhead that dwarfs the arithmetic (measured 2.9s → 0.6s at sf0.1,
    1500 users over 100k rows, packing 64 buckets).  At 100 TB the same
    rule holds — group by hash-bucket, vectorize across groups inside
    the batch; per-entity groups only when a single entity's rows are
    themselves batch-sized.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # NB: no final orderBy — a global sort range-partitions by SAMPLING
    # its child, which would execute the pandas UDF twice (measured 2×
    # the query cost).  Sort at the consumer if order matters; the
    # differential check is order-insensitive.
    buckets = F.pmod(F.col("user_id"), F.lit(_ZSCORE_BUCKETS)).alias("_bucket")
    return ev.groupBy(buckets).applyInPandas(_zscore_bucket, schema=_ZSCORE_SCHEMA)


ORACLE_ZSCORE = """
WITH s AS (
  SELECT event_id, user_id, value,
    AVG(value) OVER (PARTITION BY user_id) AS mu,
    STDDEV_SAMP(value) OVER (PARTITION BY user_id) AS sd
  FROM events
)
SELECT event_id, user_id,
  CASE WHEN sd IS NULL OR sd = 0 THEN NULL
       ELSE ROUND((value - mu) / sd, 6) END AS zscore
FROM s ORDER BY user_id, event_id
"""
