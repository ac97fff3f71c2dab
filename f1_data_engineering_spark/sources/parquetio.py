"""Partitioned Parquet layout — SURVEY.md S4/S5/S9.

The reference's directory scheme ``base/<year>/<event>/<session>/<table>.csv``
(reference: src/extract/f1_dataExtractor.py:129-137) is a hand-rolled Hive
partition layout; here it is the real thing:

    base/<table>/Year=2024/EventName=Bahrain_Grand_Prix/SessionKey=R/*.parquet

which buys partition pruning (a dashboard query for one session touches one
directory), dynamic partition pruning on joins, and `SHOW PARTITIONS`-style
catalog browsing (S9, streamlit_app.py:466-490) for free.

Scale note: per-session partitions are small (thousands of rows); at 100 TB
the fact that matters is the *telemetry* table, partitioned by
(Year, EventName) only — one leaf per race weekend keeps file counts sane
while still pruning 99% of scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "sanitize_path_component",
    "write_partitioned",
    "read_partitioned",
    "list_partitions",
    "read_evolved",
    "union_evolved",
]

#: Default partition scheme, mirroring the reference's directory keys.
SESSION_PARTITION_KEYS = ("Year", "EventName", "SessionKey")


def sanitize_path_component(col: F.Column | str) -> F.Column:
    """F19: the reference's name sanitization for path components —
    ``replace(' ','_').replace('/','_')`` (f1_dataExtractor.py:129-134)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[ /]", "_")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = SESSION_PARTITION_KEYS,
    mode: str = "overwrite",
) -> None:
    """S4+S5: partitioned Parquet sink.

    Uses dynamic partition overwrite semantics so re-ingesting one session
    is idempotent and does not clobber sibling partitions (the reference
    achieves idempotence by full-file rewrite per session).
    """
    present = [k for k in partition_by if k in df.columns]
    writer = df.write.mode(mode).option("partitionOverwriteMode", "dynamic")
    if present:
        writer = writer.partitionBy(*present)
    writer.parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table; partition columns come from the layout."""
    return spark.read.parquet(path)


def list_partitions(
    spark: SparkSession, path: str, keys: tuple[str, ...] = SESSION_PARTITION_KEYS
) -> DataFrame:
    """S9 catalog browse: distinct partition tuples, sorted.

    Reads only partition directory names (no data columns → the scan
    prunes every data file's row groups away).
    """
    df = spark.read.parquet(path)
    present = [k for k in keys if k in df.columns]
    return df.select(*present).distinct().orderBy(*present)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: ``mergeSchema`` unifies the footers of
    every file under ``path``, so rows written before a column existed
    surface it as NULL — how a long-lived lake (new telemetry channels,
    new event props appearing mid-season) stays queryable end-to-end.

    Scale note: mergeSchema footer reconciliation is a one-time
    driver-side pass over file metadata; the per-file read schema is
    then fixed.  Production tables pin the merged schema in a catalog
    instead of re-merging per query — this helper is the migration /
    backfill path.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def union_evolved(*frames: DataFrame) -> DataFrame:
    """Harmonizing union for frames with drifted schemas:
    ``unionByName(allowMissingColumns=True)`` aligns by COLUMN NAME
    (never position) and fills absent columns with NULL — the safe way
    to stack monthly extracts whose schemas grew over time."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
