"""Streaming corpus ingestion with incremental near-dup detection.

The batch side of this already exists in two halves: versioned-table
appends (sources/versioned.py) and the incremental MinHash index
advance (operators/incremental_dedup.py — hash only the delta, band
the delta against index ∪ delta, emit pairs with ≥1 new side).  This
module is the streaming glue: documents arrive as a file stream and
each micro-batch runs the EXACT batch advance via ``foreachBatch`` —
the canonical Spark pattern for transactional streaming ingestion
(the sink is a batch writer, so every guarantee proven for the batch
operator carries over verbatim).

Exactness across the stream: advance outputs PARTITION the full pair
set (proven in tests/test_incremental_dedup.py), so the union of
per-batch pair outputs equals the one-shot computation over the final
corpus — pinned for the streaming path in tests/test_streaming.py.

Scale shape: per micro-batch cost is O(batch docs) hashing + one
equi-join probing the batch's band keys against the index — the
index side is K=16 longs per document ever seen, thousands of times
smaller than the corpus.  State lives in the versioned tables, not
the streaming state store, so checkpoint recovery replays any
half-applied batch idempotently (versioned writes are
manifest-committed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import incremental_dedup as ID
from ..sources import versioned as V

__all__ = ["document_file_stream", "write_stream_dedup_ingest"]

DOCUMENTS_SCHEMA = (
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
)


def document_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source document stream (the landing zone of a corpus
    ingestion pipeline)."""
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def write_stream_dedup_ingest(
    stream: DataFrame,
    corpus_path: str,
    index_path: str,
    pairs_path: str,
    checkpoint_path: str,
    threshold: float = 0.5,
):
    """Ingest the document stream: per micro-batch, append to the
    versioned corpus, advance the MinHash signature index over exactly
    that delta, and append the newly-found near-dup pairs.

    Runs to completion over currently-available input (availableNow)
    and returns the terminated query.
    """

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        mode = "append" if V.latest_version(corpus_path) >= 0 else "overwrite"
        V.write_versioned(batch_df.select("doc_id", "text"), corpus_path, mode)
        pairs = ID.advance_dedup_index(
            spark, corpus_path, index_path, threshold=threshold
        )
        pairs.write.mode("append").parquet(pairs_path)

    q = (
        stream.writeStream.foreachBatch(_ingest)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    q.awaitTermination()
    return q
