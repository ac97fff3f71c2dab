"""XML interchange boundary (Spark 4 built-in ``xml`` source — the
former spark-xml package, now in core).

Same posture as the JSONL boundary (``jsonio``): schema-MANDATORY
reads (XML inference is a full extra pass and type-guessy at scale),
explicit rowTag, and partitioned writes.  XML shows up at real data
boundaries (feeds, legacy exports, sitemaps); the engine treats it as
an edge format: read once, land as parquet, never re-scan the XML.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_xml", "write_xml"]


def read_xml(
    spark: SparkSession, path: str, row_tag: str, schema: T.StructType
) -> DataFrame:
    """Schema-asserted XML read: one pass, no inference, malformed
    rows null out per-column (the source's PERMISSIVE default)."""
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .schema(schema)
        .load(path)
    )


def write_xml(df: DataFrame, path: str, row_tag: str, root_tag: str) -> None:
    """Partitioned XML write (one file per partition, declared tags)."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode("overwrite")
        .save(path)
    )
