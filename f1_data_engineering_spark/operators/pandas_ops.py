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


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user z-score (sample std, ddof=1); degenerate groups → NULL."""
    v = pdf["value"]
    std = v.std(ddof=1)
    if pd.isna(std) or std == 0:
        z = pd.Series([None] * len(v), dtype="float64")
    else:
        z = ((v - v.mean()) / std).round(6)
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "zscore": z}
    )


def zscore_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score of event value via ``applyInPandas``.

    Plan: one shuffle on user_id → each group becomes one Arrow batch
    through Python → results stream back columnar.  At 100 TB the
    grouped-map pattern holds as long as a single group fits in
    executor memory (users here; salt oversized groups if not).
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # NB: no final orderBy — a global sort range-partitions by SAMPLING
    # its child, which would execute the pandas UDF twice (measured 2×
    # the query cost).  Sort at the consumer if order matters; the
    # differential check is order-insensitive.
    return ev.groupBy("user_id").applyInPandas(_zscore_group, schema=_ZSCORE_SCHEMA)


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
