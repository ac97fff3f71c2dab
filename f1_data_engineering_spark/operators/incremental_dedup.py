"""Incremental corpus deduplication: new documents deduped against an
accumulated MinHash signature index, advanced from the versioned
table's change feed.

The batch near-dup pipeline (operators/dedup.py) recomputes signatures
for the whole corpus every run; at a 100 TB corpus growing ~1% a day
that is 99% wasted hashing.  The incremental shape this module
implements is how production training-data pipelines actually run:

* the corpus is a VERSIONED table (sources/versioned.py) — appends are
  the ingestion unit, and ``read_version_delta`` yields exactly the
  newly-landed documents;
* the signature INDEX is a second versioned table of
  (doc_id, sig, base_version): K=16 longs per document ever seen —
  thousands of times smaller than the corpus, and append-only;
* one ``advance`` hashes ONLY the delta, finds near-dup pairs with at
  least one new side by banding new docs against (index ∪ new), and
  appends the new signatures to the index.  Per-advance cost is
  O(new docs) hashing + an equi-join whose probe side is the delta;
* pair outputs across advances PARTITION the full pair set: old–old
  pairs were emitted by earlier advances, so the union over advances
  equals the one-shot computation on the full corpus (proven in
  tests/test_incremental_dedup.py);
* an overwrite in the corpus range invalidates the index by
  definition — the advance detects it (ValueError from the delta
  read) and rebuilds index + pairs from the full snapshot, exactly
  like operators/incremental.py's rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import versioned as V
from .dedup import band_keys_df, estimate_pairs, signatures_df

__all__ = ["advance_dedup_index", "index_base_version"]


def index_base_version(spark: SparkSession, index_path: str) -> int:
    """Corpus version the index covers (-1 for an empty/new index).

    Answered from the commit log's per-file [min, max] stats when they
    are complete (zero Spark jobs — the index is append/overwrite-only
    so live-file bounds are exact); falls back to a scan otherwise."""
    b = V.log_column_bounds(index_path, ("base_version",))
    if b is not None:
        return int(b["base_version"][1])
    try:
        idx = V.read_versioned(spark, index_path)
    except ValueError:
        return -1
    return idx.agg(F.max("base_version")).collect()[0][0]


def advance_dedup_index(
    spark: SparkSession,
    corpus_path: str,
    index_path: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Advance the signature index to the corpus head; return the
    near-dup pairs (d1 < d2, est_jaccard ≥ threshold) INVOLVING AT
    LEAST ONE newly-seen document.  Returns an empty pair frame when
    the index is already current.
    """
    head = V.latest_version(corpus_path)
    last = index_base_version(spark, index_path)
    empty = spark.createDataFrame(
        [], "d1 long, d2 long, est_jaccard double"
    )
    if head < 0 or head <= last:
        return empty

    rebuild = last < 0
    if not rebuild:
        try:
            delta = V.read_version_delta(spark, corpus_path, last, head)
        except ValueError:  # overwrite in range → index invalid
            rebuild = True
    if rebuild:
        delta = V.read_versioned(spark, corpus_path)
        old_sigs = None
    else:
        old_sigs = V.read_versioned(spark, index_path).select("doc_id", "sig")

    new_docs = delta.select("doc_id", "text")
    # emptiness from the commit log's ::rows stats — zero Spark jobs
    # for the common non-empty advance (the isEmpty job was one whole
    # scheduling round trip per advance); stat-less/rebuild ranges
    # fall back to the scan
    n_new = (
        V.delta_row_count(corpus_path, last, head) if not rebuild else None
    )
    if n_new == 0 or (n_new is None and new_docs.isEmpty()):
        return empty
    # signatures are K longs/doc — cache: consumed by banding, the
    # estimate join, and the index append
    new_sigs = signatures_df(new_docs).cache()

    all_sigs = (
        new_sigs if old_sigs is None else old_sigs.unionByName(new_sigs)
    )
    bands_new = band_keys_df(new_sigs)
    bands_all = band_keys_df(all_sigs)
    # probe side = the delta only: every emitted pair has ≥1 new doc,
    # old–old pairs were emitted when their younger side was new
    cand = (
        bands_new.alias("a")
        .join(
            bands_all.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("d1"),
            F.greatest("a.doc_id", "b.doc_id").alias("d2"),
        )
        .distinct()
    )
    pairs = estimate_pairs(cand, all_sigs).filter(
        F.col("est_jaccard") >= threshold
    )

    # rebalance: the signature frame inherits the delta scan's
    # partitioning — K-long rows commit as ~32 tiny files otherwise
    # (guide §6); AQE sizes the write by bytes at any scale
    V.write_versioned(
        new_sigs.withColumn("base_version", F.lit(head)).hint("rebalance"),
        index_path,
        mode="overwrite" if rebuild else "append",
    )
    return pairs
