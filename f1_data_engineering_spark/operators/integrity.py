"""Referential-integrity audit: orphan counts for every FK edge of the
test warehouse in one result table.

The reference trusts its extractor to emit consistent CSVs (no FK
checks anywhere in f1_dataTransformer.py); a lake ingesting from many
producers can't.  This is the standing data-quality gate a 100 TB
deployment schedules after every load.

Scale shape per edge: LEFT ANTI join child→parent on the key.  Parent
key sets are DISTINCT-projected first (a parent table's key column is
far smaller than the table) and broadcast when small; the anti join
never materializes matches, so each edge costs one pass over the
child's key column.  Edges evaluate independently — Spark runs the
union's branches as parallel jobs under the same action.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

#: (edge name, child table, child key, parent table, parent key)
FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
)


def fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per FK edge: child rows, child rows with NULL keys, and
    orphans (non-null keys with no parent)."""
    outs = []
    for name, child, ck, parent, pk in FK_EDGES:
        c = load_table(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias("k")).distinct()
        orphans = (
            c.filter(F.col("k").isNotNull())
            .join(F.broadcast(p), "k", "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        totals = c.agg(
            F.count(F.lit(1)).alias("n_child"),
            # COALESCE matches the oracle: SUM over an EMPTY child table
            # is NULL (→ float64 in pandas, hash-visible), not 0
            F.coalesce(
                F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias("n_null_keys"),
        )
        outs.append(
            totals.crossJoin(orphans).select(
                F.lit(name).alias("fk_edge"), "n_child", "n_null_keys", "n_orphans"
            )
        )
    return reduce(DataFrame.unionByName, outs)


def _sql_edge(name: str, child: str, ck: str, parent: str, pk: str) -> str:
    return f"""
SELECT '{name}' AS fk_edge,
  CAST(COUNT(*) AS BIGINT) AS n_child,
  CAST(COALESCE(SUM(CASE WHEN c.{ck} IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
    AS n_null_keys,
  CAST(COALESCE(SUM(CASE WHEN c.{ck} IS NOT NULL AND p.{pk} IS NULL
                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_orphans
FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
  ON c.{ck} = p.{pk}"""


ORACLE_FK_AUDIT = "\nUNION ALL\n".join(_sql_edge(*e) for e in FK_EDGES)
