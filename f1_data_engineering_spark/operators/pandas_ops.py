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


# ---------------------------------------------------------------------------
# Grouped-AGG pandas UDF (the scalar-aggregate leg of the UDF matrix)
# ---------------------------------------------------------------------------

#: Series -> scalar pandas UDFs: the UDAF surface.  Each evaluates over
#: one group's column as a single Arrow batch (with partial batches for
#: very large groups), so the Python cost is per-GROUP, not per-row.
_AGG_UDFS = None


def _agg_udfs():
    """Build the grouped-agg pandas UDFs lazily (registration needs an
    active session on some backends; module import must stay cheap).

    The count is ALSO a pandas UDF: Spark rejects mixing group-agg
    pandas UDFs with JVM aggregates in one ``agg``
    (INVALID_PANDAS_UDF_PLACEMENT) — a real constraint of the surface,
    so the query works within it.
    """
    global _AGG_UDFS
    if _AGG_UDFS is None:
        @F.pandas_udf("double")
        def _median(v: pd.Series) -> float:
            return float(v.quantile(0.5, interpolation="linear"))

        @F.pandas_udf("double")
        def _iqr(v: pd.Series) -> float:
            return float(
                v.quantile(0.75, interpolation="linear")
                - v.quantile(0.25, interpolation="linear")
            )

        @F.pandas_udf("long")
        def _n(v: pd.Series) -> int:
            return int(len(v))

        _AGG_UDFS = (_median, _iqr, _n)
    return _AGG_UDFS


def user_value_median_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user median and IQR of event value via GROUPED_AGG pandas
    UDFs — the UDAF path: Spark shuffles on user_id, each group's
    value column crosses to Python as Arrow batches, pandas computes
    the quantiles, one scalar returns per group.

    pandas' linear interpolation is the same formula as ANSI
    PERCENTILE_CONT / DuckDB quantile_cont, so the oracle is exact
    (outputs rounded to 6 dp to absorb ulp-level noise).  Production
    note: Spark's built-in ``percentile`` covers this exact case
    JVM-side; the query exists to pin the grouped-agg machinery on
    semantics a SQL oracle can replicate.
    """
    med, iqr, n = _agg_udfs()
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    return (
        ev.groupBy("user_id")
        .agg(
            F.round(med(F.col("value")), 6).alias("med_value"),
            F.round(iqr(F.col("value")), 6).alias("iqr_value"),
            n(F.col("value")).alias("n_events"),
        )
    )


ORACLE_MEDIAN_IQR = """
SELECT user_id,
  ROUND(quantile_cont(value, 0.5), 6) AS med_value,
  ROUND(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 6) AS iqr_value,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id ORDER BY user_id
"""
