"""ORC source/sink.

Parquet is this engine's primary layout (TESTDATA.md tables, the
silver lake in ``pipeline``), but warehouses that interoperate with
Hive/Trino ecosystems frequently land ORC — Spark ships a native
vectorized ORC reader/writer, so supporting the boundary costs only
pinned options, mirroring the engine's Parquet/JSONL posture:

* **reads take an explicit schema** — same policy as ``jsonio``
  (inference on ORC is cheap — footer metadata — but an asserted
  schema catches drift at the boundary instead of mid-query).
* **predicate pushdown** stays on (``spark.sql.orc.filterPushdown``
  defaults true in Spark 3+): ORC stripe/row-group min-max and bloom
  stats prune like Parquet's.
* **partitioned writes** use the same dynamic-overwrite idempotency
  as ``parquetio.write_partitioned`` — re-running a slice replaces
  only that slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_orc", "write_orc_partitioned"]


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """Read ORC with an asserted schema (partition columns inferred
    from the directory layout as usual)."""
    return spark.read.schema(schema).orc(path)


def write_orc_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Write ORC, optionally hive-partitioned, with zstd compression
    (best size/speed trade of the codecs ORC supports in Spark 4).

    Uses dynamic partition overwrite when partitioned: only the
    partitions present in ``df`` are replaced — idempotent incremental
    loads, same contract as the parquet sink.
    """
    writer = df.write.mode(mode).option("compression", compression)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols).option(
            "partitionOverwriteMode", "dynamic"
        )
    writer.orc(path)
