"""Multimodal-column plumbing (beyond-reference training-data scope).

Media (image/audio/video) is modeled as opaque ``binary`` columns with
typed metadata alongside — the lakehouse pattern for multimodal
training data.  The Spark-side plumbing (schemas, batch shapes,
``mapInPandas`` UDF signatures, partition behavior) is real and tested;
the actual codec work is stubbed (no image/audio libs in this
container) behind a deterministic fake + ``NotImplementedError``.

Scale notes: binary payloads ride the scan (Parquet keeps them
column-separate, so metadata-only queries never read bytes); decode
runs as Arrow-batched ``mapInPandas`` — the one legitimately-Python
stage — sized by ``spark.sql.files.maxPartitionBytes`` so a batch of
decoded frames fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.registry import load_table

#: Schema of a decoded-media feature batch (what a real decoder emits).
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column: byte length +
    content digest.  Bytes are synthesized from documents.text (the
    container has no media files); the query shape — project binary →
    compute metadata, no decode — is the production scan pattern."""
    d = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).cast("long").alias("n_bytes"),
        F.sha2(blob, 256).alias("sha256_hex"),
    ).orderBy("doc_id")


ORACLE_BLOB_METADATA = """
SELECT doc_id,
  CAST(strlen(text) AS BIGINT) AS n_bytes,
  sha256(text) AS sha256_hex
FROM documents ORDER BY doc_id
"""


def decode_media_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decoder for one Arrow batch.

    A real implementation would call PIL/ffmpeg here; the container has
    neither, so dimensions/luma derive deterministically from the bytes
    (stable across runs and engines).  Replace the body — not the
    signature — to productionize.
    """
    n_bytes = batch["blob"].map(len)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": n_bytes.astype("int64"),
            "width": (n_bytes % 1920 + 1).astype("int32"),
            "height": (n_bytes % 1080 + 1).astype("int32"),
            "mean_luma": (n_bytes % 256).astype("float64") / 255.0,
        }
    )


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: (doc_id, blob) → DECODED_SCHEMA.

    ``mapInPandas`` streams column batches through Python once —
    the only Python hop in the pipeline; everything downstream is
    JVM-side again.
    """

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield decode_media_batch(b)

    return df.mapInPandas(_gen, DECODED_SCHEMA)


def decode_media_real(df: DataFrame) -> DataFrame:
    """Production decoder entry point — requires codec libraries that
    are not available in this environment."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg) are not installed in this container; "
        "use decode_media() which runs the same plumbing with a "
        "deterministic fake decoder"
    )
