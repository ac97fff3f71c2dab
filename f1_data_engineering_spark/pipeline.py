"""End-to-end F1 lakehouse pipeline — EP1/EP2 orchestration
(SURVEY.md §7.7) as idempotent Spark jobs.

The reference's triple-nested driver loop (year → event → session,
f1_dataExtractor.py:363-405) with a 5 s sleep per session becomes:
land raw → one lazy transform per table → dynamic-partition-overwrite
parquet.  Re-running a session overwrites exactly that session's
partitions (idempotent); sibling sessions are untouched.

The network fetch itself (FastF1) stays outside the engine — sources
here are landed CSV trees, which is also what this container has.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.csvio import read_csv_all_string
from .sources.f1_compat import transform_table
from .sources.parquetio import write_partitioned

__all__ = ["ingest_table", "ingest_session_tree", "SESSION_KEYS"]

SESSION_KEYS = ("Year", "EventName", "SessionKey")


def ingest_table(
    spark: SparkSession,
    raw_glob: str,
    table: str,
    lake_dir: str,
    partition_values: dict[str, str] | None = None,
) -> DataFrame:
    """bronze CSV → typed silver parquet for one table.

    ``partition_values`` supplies (Year, EventName, SessionKey) when the
    raw files don't carry them as columns (the reference encodes them
    only in the directory path).
    """
    raw = read_csv_all_string(spark, raw_glob)
    typed, _, _ = transform_table(raw, table)
    for k, v in (partition_values or {}).items():
        typed = typed.withColumn(k, F.lit(v))
    write_partitioned(typed, os.path.join(lake_dir, table), SESSION_KEYS)
    return typed


def ingest_session_tree(
    spark: SparkSession, raw_dir: str, lake_dir: str, tables: tuple[str, ...]
) -> dict[str, int]:
    """Ingest every ``<year>/<event>/<session>/<table>.csv`` under
    ``raw_dir`` into the partitioned silver lake.  Partition columns are
    derived from the file path (`input_file_name`), replacing the
    reference's per-directory Python loop with one distributed job per
    table.
    """
    counts: dict[str, int] = {}
    for table in tables:
        pattern = os.path.join(raw_dir, "*", "*", "*", f"{table}.csv")
        raw = read_csv_all_string(spark, pattern)
        # relative path below raw_dir, scheme-agnostic (input_file_name
        # yields file:///…)
        import re as _re

        rel = F.regexp_extract(
            F.input_file_name(), _re.escape(raw_dir.rstrip("/")) + "/(.*)$", 1
        )
        path_parts = F.split(rel, "/")
        raw = (
            raw.withColumn("Year", path_parts.getItem(0).try_cast("int"))
            .withColumn("EventName", path_parts.getItem(1))
            .withColumn("SessionKey", path_parts.getItem(2))
        )
        typed, _, _ = transform_table(raw, table)
        write_partitioned(typed, os.path.join(lake_dir, table), SESSION_KEYS)
        counts[table] = typed.count()
    return counts
