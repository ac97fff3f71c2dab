"""JSON-lines source/sink (beyond-reference training-data scope).

Training corpora interchange as JSONL (one JSON document per line —
the format of The Pile / C4 / RedPajama-style dumps), so the engine
needs a first-class JSONL boundary next to Parquet and CSV.  Spark's
``json`` format IS newline-delimited JSON, so both directions are
thin wrappers that pin the scale-relevant options:

* **reads take an explicit schema.**  Schema inference on JSON is a
  FULL extra pass over the data before the real scan — at 100 TB that
  doubles the job.  ``read_jsonl`` requires the schema (or an explicit
  ``infer=True`` opt-in for exploration); corrupt rows are captured in
  a ``_corrupt_record`` column (PERMISSIVE) instead of failing the
  scan, which is the only sane default for web-scale scrapes.
* **writes compress.**  JSONL is ~3-5× the bytes of the same rows in
  Parquet; gzip per file keeps the sink network-bound, not disk-bound,
  and stays line-splittable per file for downstream re-sharding.

Columnar-format note: JSONL is the INTERCHANGE boundary, not the
compute layout — pipelines should land JSONL → Parquet once (see
``pipeline.ingest_session_tree``) and run queries on Parquet, where
column pruning and predicate pushdown exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_jsonl", "write_jsonl", "CORRUPT_COL"]

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    infer: bool = False,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read newline-delimited JSON.

    ``schema`` is required unless ``infer=True`` (inference costs a
    full extra pass — opt-in only).  With ``keep_corrupt``, rows that
    fail to parse land in ``_corrupt_record`` instead of aborting the
    scan (PERMISSIVE mode); filter ``col(CORRUPT_COL).isNotNull()``
    into a quarantine sink to audit them.  NB Spark refuses a query
    that references ONLY the corrupt column on a raw scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — ``cache()`` the frame or
    include a data column when auditing.
    """
    if schema is None and not infer:
        raise ValueError(
            "read_jsonl requires an explicit schema (or infer=True): "
            "JSON schema inference is a full extra pass over the data"
        )
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        if keep_corrupt:
            if isinstance(schema, str):
                schema = T._parse_datatype_string(schema)
            if CORRUPT_COL not in schema.fieldNames():
                schema = T.StructType(
                    list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
                )
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "gzip",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write newline-delimited JSON, one gzip'd shard per task.

    Shard count = partition count of ``df``: re-``repartition(n)``
    upstream to target shard sizes (aim 100-500 MB compressed for
    downstream loader parallelism).
    """
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
