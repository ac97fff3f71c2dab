"""Test-table registry: load the driver's parquet tables with explicit schemas.

The scan layer for the TPC-H-ish correctness tables (TESTDATA.md).
Schemas are asserted, not inferred, so Catalyst can prune columns and
push predicates into the Parquet reader with full type information.

Scale note: at 100 TB these tables would be partitioned (orders/lineitem
by date, events by ts-date) and the loader would pick up partition
columns automatically; the API here is path-based so that swap is a
config change, not a code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TEST_TABLES, TEST_TABLE_NAMES

__all__ = ["load_table", "load_tables", "register_views", "default_sf_dir", "spread"]

#: Columns stored as parquet TIMESTAMP(NANOS) — Spark has no nanosecond
#: timestamp type, so these are read as raw INT64 nanos (requires
#: ``spark.sql.legacy.parquet.nanosAsLong``-compatible schema, i.e. we
#: just declare LongType) and truncated to microseconds.  The driver
#: data carries no sub-microsecond component, so this is lossless.
#: Cost at scale: a ts predicate no longer prunes parquet row groups on
#: this column (the scan filter applies post-conversion) — for a real
#: deployment, land the data as TIMESTAMP(MICROS) instead.
NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table as a DataFrame with its declared schema."""
    if name not in TEST_TABLES:
        raise KeyError(f"unknown test table {name!r}; known: {TEST_TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = TEST_TABLES[name]
    ns_cols = NANOS_TS_COLS.get(name, ())
    if not ns_cols:
        return spark.read.schema(schema).parquet(path)
    read_schema = T.StructType(
        [
            T.StructField(
                f.name,
                T.LongType() if f.name in ns_cols else f.dataType,
                f.nullable,
            )
            for f in schema.fields
        ]
    )
    df = spark.read.schema(read_schema).parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition ``df`` on ``key`` to the session's default
    parallelism, decoupling COMPUTE parallelism from input BYTE layout.

    Spark sizes scan partitions by ``spark.sql.files.maxPartitionBytes``
    — the right unit for I/O-bound scans, the wrong one for stages
    whose per-byte cost is enormous (an md5 per token, a regex parse
    per row).  A small single-row-group parquet file otherwise pins
    the whole hash/regex stage to ONE core.  The shuffle this inserts
    moves only the narrow projection the caller prepared, and the
    operators that use it all shuffle (or are order-insensitive)
    downstream anyway.

    At 100 TB the scan naturally yields thousands of partitions and
    this becomes a near-no-op rebalance; the guard against tiny inputs
    is deliberate — partition count is capped by the data only when
    the data is smaller than the core count.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(key))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TEST_TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TEST_TABLE_NAMES
) -> None:
    """Register each table as a temp view so spark.sql() can address it."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
