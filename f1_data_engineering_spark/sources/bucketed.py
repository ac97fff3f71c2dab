"""Bucketed tables — shuffle-free co-located joins (SURVEY.md §4.2).

At 100 TB the fact⋈fact join (lineitem ⋈ orders on orderkey) is the
single largest shuffle in the workload.  Bucketing both tables on the
join key at write time pre-partitions the data identically, so the
join compiles to a zero-exchange sort-merge over matching buckets —
the shuffle is paid ONCE at ingest and amortized over every
subsequent join.

Local caveat: bucketed tables must live in the session catalog
(`saveAsTable`), not bare parquet paths — the bucket metadata is what
lets Catalyst elide the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join_ready"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    Sorting within buckets lets the sort-merge join skip its sort step
    too — the join becomes a pure streaming merge.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key."""
    return spark.table(left).join(
        spark.table(right),
        spark.table(left).columns[0] == spark.table(right).columns[0],
    )
