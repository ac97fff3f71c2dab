"""Scale-safe global ranking building blocks.

A bare ``Window.orderBy(...)`` with no partition key funnels the whole
relation through one task.  That is fine for metadata-sized frames
(per-bucket offsets, per-island merges) but not for anything that grows
with the corpus — a vocabulary can reach 10⁸ terms at 100 TB.  Two
exact constructions avoid it:

* ``bucketed_topk_rank`` — global row_number restricted to the top-k:
  bucket-local ranks prune to ≤ n_buckets·k rows first (any global
  top-k member is in its bucket's top-k), so the final ordered window
  sees a bounded frame.
* ``offset_global_rank`` — full global row_number when every row needs
  its rank and the leading sort key has FEW distinct values (e.g. term
  counts under Zipf): rank within each key-group (partitioned window)
  plus a driver-collected per-group offset table (group-count-sized,
  metadata) broadcast back.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def bucketed_topk_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    k: int,
    bucket_key: str,
    rank_col: str = "rank",
    n_buckets: int = 32,
) -> DataFrame:
    """Rows with global ``row_number() <= k`` under ``order_by``, plus
    the rank itself — without an unbounded single-partition window.

    ``bucket_key`` only needs to spread rows (hash-bucketed); the
    pruned global window input is ≤ n_buckets·k rows by construction.
    """
    b = F.pmod(F.xxhash64(F.col(bucket_key)), F.lit(n_buckets))
    wb = W.partitionBy("__bkt").orderBy(*order_by)
    pruned = (
        df.withColumn("__bkt", b)
        .withColumn("__lr", F.row_number().over(wb))
        .filter(F.col("__lr") <= k)
    )
    # bounded frame: ≤ n_buckets·k survivors — metadata-sized by design
    wg = W.orderBy(*order_by)
    return (
        pruned.withColumn(rank_col, F.row_number().over(wg))
        .filter(F.col(rank_col) <= k)
        .drop("__bkt", "__lr")
    )


def offset_global_rank(
    df: DataFrame,
    group_col: str,
    group_desc: bool,
    tie_order: Sequence[Column],
    rank_col: str = "rank",
) -> DataFrame:
    """Exact global row_number over (group_col [desc], *tie_order) via
    group-local windows + broadcast group offsets.

    Requires the number of DISTINCT ``group_col`` values to be driver-
    metadata-sized (true for count-valued keys under any power-law:
    distinct counts grow ~√mass).  Null groups sort first, matching
    Spark's asc_nulls_first / desc_nulls_last would differ — callers
    here have non-null groups.
    """
    spark = df.sparkSession
    wb = W.partitionBy(group_col).orderBy(*tie_order)
    local = df.withColumn("__lr", F.row_number().over(wb))
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__c")).collect()
    counts.sort(key=lambda r: r[group_col], reverse=group_desc)
    offs, acc = [], 0
    for r in counts:
        offs.append((r[group_col], acc))
        acc += r["__c"]
    off_df = spark.createDataFrame(offs, schema=f"{group_col} long, __off long")
    return (
        local.join(F.broadcast(off_df), group_col)
        .withColumn(rank_col, F.col("__off") + F.col("__lr"))
        .drop("__lr", "__off")
    )
