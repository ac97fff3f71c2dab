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

from ..schemas import TEST_TABLES, TEST_TABLE_NAMES

__all__ = ["load_table", "load_tables", "register_views", "default_sf_dir"]


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table as a DataFrame with its declared schema."""
    if name not in TEST_TABLES:
        raise KeyError(f"unknown test table {name!r}; known: {TEST_TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    return spark.read.schema(TEST_TABLES[name]).parquet(path)


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
