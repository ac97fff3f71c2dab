"""Dimension maintenance: MERGE/upsert expressed as one join pass
(SCD Type 2 — slowly changing dimension with row versioning).

The reference pipeline rebuilds its CSV outputs from scratch every run
(f1_dataTransformer.py walks the whole tree); a warehouse at 100 TB
cannot.  This module gives the incremental path: the same plan shape
Delta Lake's MERGE INTO compiles to — shuffle-join the dimension with
the (much smaller) change set on the business key, rewrite only
affected rows.  Here the "write" is the returned DataFrame; a lake
deployment pins it under a partition spec on ``is_current`` so the hot
slice stays scan-cheap.

Everything is emitted from ONE full-outer join: each joined row
expands (via ``inline``) to 0-2 output rows — the closed-out old
version and/or the opened new version — so the dimension is scanned
once, not once per MERGE branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

#: Epoch the initial dimension load is stamped with.
DIM_EPOCH = "1990-01-01"


def scd2_customer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a change set to the customer dimension with SCD2
    semantics and return the post-merge dimension.

    Change set (deterministic, derived from orders): per ordering
    customer, effective date = their latest order date, new account
    balance = their max order total.  MERGE rules:

    - key matched, balance changed  → close the old row
      (``valid_to`` = effective date, ``is_current`` = false) AND
      insert the new version (``valid_from`` = effective date, open).
    - key matched, balance unchanged → keep the current row as-is.
    - dimension key with no change row → keep as-is.
    - change row with no dimension key → insert as a new open row
      (empty under TPC-H FK integrity, but the branch is real).

    Row multiplicity per key is decided by expression, materialized
    with ``inline`` (Expand) — no UNION re-scan of the dimension.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    updates = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("eff_date"),
            F.max("o_totalprice").alias("new_acctbal"),
        )
    )
    j = c.join(updates, "c_custkey", "full_outer")

    epoch = F.to_timestamp(F.lit(DIM_EPOCH))
    null_ts = F.lit(None).cast("timestamp")
    has_upd = F.col("eff_date").isNotNull()
    has_base = F.col("c_acctbal").isNotNull()
    changed = has_upd & has_base & (F.col("new_acctbal") != F.col("c_acctbal"))
    insert = has_upd & ~has_base

    def _row(bal, vfrom, vto, current):
        return F.struct(
            bal.alias("acctbal"),
            vfrom.alias("valid_from"),
            vto.alias("valid_to"),
            current.alias("is_current"),
        )

    old_closed = _row(F.col("c_acctbal"), epoch, F.col("eff_date"), F.lit(False))
    old_open = _row(F.col("c_acctbal"), epoch, null_ts, F.lit(True))
    new_open = _row(F.col("new_acctbal"), F.col("eff_date"), null_ts, F.lit(True))

    versions = (
        F.when(changed, F.array(old_closed, new_open))
        .when(insert, F.array(new_open))
        .otherwise(F.array(old_open))
    )
    return j.select(
        "c_custkey", "c_mktsegment", F.inline(versions)
    )


ORACLE_SCD2 = f"""
WITH updates AS (
  SELECT o_custkey AS c_custkey,
         MAX(o_orderdate) AS eff_date,
         MAX(o_totalprice) AS new_acctbal
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT coalesce(c.c_custkey, u.c_custkey) AS c_custkey,
         c.c_mktsegment, c.c_acctbal, u.eff_date, u.new_acctbal,
         (c.c_custkey IS NOT NULL) AS has_base,
         (u.eff_date IS NOT NULL) AS has_upd
  FROM customer c FULL OUTER JOIN updates u USING (c_custkey)
)
SELECT c_custkey, c_mktsegment, c_acctbal AS acctbal,
       TIMESTAMP '{DIM_EPOCH}' AS valid_from, eff_date AS valid_to,
       FALSE AS is_current
FROM j WHERE has_upd AND has_base AND new_acctbal <> c_acctbal
UNION ALL
SELECT c_custkey, c_mktsegment, new_acctbal,
       eff_date, NULL::TIMESTAMP, TRUE
FROM j WHERE has_upd AND (NOT has_base OR new_acctbal <> c_acctbal)
UNION ALL
SELECT c_custkey, c_mktsegment, c_acctbal,
       TIMESTAMP '{DIM_EPOCH}', NULL::TIMESTAMP, TRUE
FROM j WHERE has_base AND NOT (has_upd AND new_acctbal <> c_acctbal)
"""


def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) join of the fact table against the SCD2
    dimension built by :func:`scd2_customer_merge`: each order joins
    the dimension VERSION that was valid on its order date
    (``valid_from <= d < valid_to``, open row = current), then rolls
    up per (market segment, matched-version currency).

    The temporal predicate rides on the ``c_custkey`` equi join — at
    most a handful of versions per key, so the version filter is
    per-key-local work after a standard hash join, never a range join
    over the whole dimension.  This is the query pattern that makes
    SCD2 worth maintaining: historically correct attribution without
    snapshotting the dimension per day.
    """
    dim = scd2_customer_merge(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    d = F.col("o_orderdate")
    pit = o.join(dim, o["o_custkey"] == dim["c_custkey"]).filter(
        (F.col("valid_from") <= d)
        & (F.col("valid_to").isNull() | (d < F.col("valid_to")))
    )
    return (
        pit.groupBy("c_mktsegment", "is_current")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_distinct("c_custkey").alias("n_customers"),
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            ).alias("order_value"),
        )
        .orderBy("c_mktsegment", "is_current")
    )


ORACLE_SCD2_PIT = f"""
WITH dim AS ({ORACLE_SCD2}),
pit AS (
  SELECT o.o_totalprice, dim.c_custkey, dim.c_mktsegment, dim.is_current
  FROM orders o JOIN dim ON o.o_custkey = dim.c_custkey
  WHERE dim.valid_from <= CAST(o.o_orderdate AS TIMESTAMP)
    AND (dim.valid_to IS NULL OR CAST(o.o_orderdate AS TIMESTAMP) < dim.valid_to)
)
SELECT c_mktsegment, is_current,
  COUNT(*) AS n_orders,
  COUNT(DISTINCT c_custkey) AS n_customers,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_value
FROM pit GROUP BY c_mktsegment, is_current
ORDER BY c_mktsegment, is_current
"""


# ---------------------------------------------------------------------------
# Snapshot diff (CDC between two table versions)
# ---------------------------------------------------------------------------


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two snapshots of the customer
    dimension: per (market segment, change type) counts plus balance
    deltas — the audit a versioned lake runs between any two commits
    (the per-row form is the same join minus the final aggregate).

    Snapshot v2 is derived deterministically in-query so both engines
    diff the identical pair: key % 17 == 0 rows are DELETED, key % 10
    == 3 rows get acctbal + 100 (UPDATED), and key % 23 == 5 rows are
    re-INSERTED under key + 10^9 (simulating new arrivals); everything
    else is UNCHANGED.

    Scale shape: ONE full-outer join on the key (both sides hash-
    partition once) feeding one map-side-combinable aggregate — no
    row-level CDC log required; this is the fallback diff when the
    writer didn't record one.  Money deltas ride the fixed-point cents
    path (exact integers) and convert to double once at the edge.
    """
    from .relational import _cents

    v1 = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", _cents("c_acctbal").alias("bal1")
    )
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", _cents("c_acctbal").alias("bal2")
    )
    v2 = (
        base.filter(F.col("c_custkey") % 17 != 0)
        .withColumn(
            "bal2",
            F.when(
                F.col("c_custkey") % 10 == 3, F.col("bal2") + 10000
            ).otherwise(F.col("bal2")),
        )
        .unionByName(
            base.filter(F.col("c_custkey") % 23 == 5).select(
                (F.col("c_custkey") + 1000000000).alias("c_custkey"),
                "c_mktsegment",
                "bal2",
            )
        )
    )
    j = v1.alias("a").join(
        v2.alias("b"), F.col("a.c_custkey") == F.col("b.c_custkey"), "full_outer"
    )
    change = (
        F.when(F.col("a.c_custkey").isNull(), F.lit("inserted"))
        .when(F.col("b.c_custkey").isNull(), F.lit("deleted"))
        .when(F.col("bal1") != F.col("bal2"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    delta = F.coalesce(F.col("bal2"), F.lit(0)) - F.coalesce(F.col("bal1"), F.lit(0))
    return (
        j.select(
            F.coalesce(F.col("a.c_mktsegment"), F.col("b.c_mktsegment")).alias(
                "c_mktsegment"
            ),
            change.alias("change_type"),
            delta.alias("delta_cents"),
        )
        .groupBy("c_mktsegment", "change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum("delta_cents").cast("double") / 100).alias("balance_delta"),
        )
        .orderBy("c_mktsegment", "change_type")
    )


ORACLE_SNAPSHOT_DIFF = """
WITH v1 AS (
  SELECT c_custkey, c_mktsegment,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal1
  FROM customer
),
base AS (
  SELECT c_custkey, c_mktsegment,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal2
  FROM customer
),
v2 AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 10 = 3 THEN bal2 + 10000 ELSE bal2 END AS bal2
  FROM base WHERE c_custkey % 17 <> 0
  UNION ALL
  SELECT c_custkey + 1000000000, c_mktsegment, bal2
  FROM base WHERE c_custkey % 23 = 5
),
j AS (
  SELECT coalesce(a.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
    CASE WHEN a.c_custkey IS NULL THEN 'inserted'
         WHEN b.c_custkey IS NULL THEN 'deleted'
         WHEN a.bal1 <> b.bal2 THEN 'updated'
         ELSE 'unchanged' END AS change_type,
    COALESCE(b.bal2, 0) - COALESCE(a.bal1, 0) AS delta_cents
  FROM v1 a FULL OUTER JOIN v2 b ON a.c_custkey = b.c_custkey
)
SELECT c_mktsegment, change_type,
  COUNT(*) AS n_rows,
  CAST(CAST(SUM(delta_cents) AS BIGINT) AS DOUBLE) / 100 AS balance_delta
FROM j GROUP BY c_mktsegment, change_type
ORDER BY c_mktsegment, change_type
"""
