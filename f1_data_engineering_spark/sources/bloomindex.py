"""Per-file Bloom-filter index for the versioned lake: point-lookup
file skipping on UNCLUSTERED columns.

Min/max manifest stats (``read_versioned_pruned``) prune range
predicates on CLUSTERED columns; a point lookup on a high-cardinality
column that the layout was not sorted by (a user id, an order key in a
date-clustered table) matches every file's [min, max] and prunes
nothing.  Real formats answer this with a Bloom filter per file
(Delta's bloom filter index, Parquet's optional BF pages): a tiny
bitmap that answers "this file definitely does NOT contain v" with no
false negatives.  This module is that sidecar for the mini-format:

* **Index layout** — ``<table>/_bloom/<column>.json``: m/k parameters
  plus one m-bit bitmap (as 64-bit words) per indexed data file,
  OUTSIDE the transaction log (the log's snapshot arithmetic never
  sees it; a reader without the index just scans — the index is an
  optimization, never a correctness input).
* **Incremental build** — :func:`build_bloom_index` indexes only
  snapshot files MISSING from the manifest, so the post-DML/append
  refresh costs one scan of the new files, not the table.  Entries
  for files that left the snapshot are inert (same rule as deletion
  vectors).
* **Lookup** — :func:`read_versioned_bloom_pruned` tests the k bit
  positions of the probe value driver-side against each file's bitmap
  (manifest-sized work), scans only possible files (unindexed files
  are conservatively scanned), applies deletion vectors, and filters
  exactly — the Bloom filter decides which FILES can be skipped,
  never which rows qualify.

Bit positions use the repo's engine-neutral md5 recipe (first 15 hex
chars as a 60-bit int), computed by Spark expressions at build time
and by ``hashlib`` at probe time — identical by construction, which
``tests/test_bloomindex.py`` pins along with the no-false-negative
property under appends, CoW rewrites, and MoR deletes.

Sizing: m = 2^14 bits and k = 6 give a false-positive rate of
~0.03% at ~800 distinct values/file and ~2% at ~2000 (the standard
(1 - e^(-kn/m))^k estimate; k = 6 is within rounding of the optimal
(m/n)·ln 2 at n = 2000), at 2 KB/file of index — at 100 TB / 1 GB
files that is ~200 MB of manifest for the whole table, read once per
lookup (or cached on the driver).  The in-query pruning assertions in
``operators/lakeperf.py`` bound an absent key's scan at HALF the
files, so even the 2000-values/file regime carries a ~25× margin.
An existing manifest built under a different (m, k) is detected and
rebuilt from scratch (the sizes are stored per manifest).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .versioned import (
    _apply_dvs,
    _read_with_log_schema,
    _snapshot_files,
)

#: Bits per file bitmap (power of two) and hash-function count.
BLOOM_M = 1 << 14
BLOOM_K = 6

_WORDS = BLOOM_M // 64


def _index_path(path: str, column: str) -> str:
    return os.path.join(path, "_bloom", f"{column}.json")


def _positions_expr(column: str) -> F.Column:
    """Array of the k bit positions for a column value — Spark side."""
    s = F.col(column).cast("string")
    pos = []
    for i in range(BLOOM_K):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bf{i}#"), s).cast("binary")), 1, 15
            ),
            16,
            10,
        ).cast("long")
        pos.append(h % BLOOM_M)
    return F.array(*pos)


def _positions_py(value) -> list[int]:
    """The SAME k positions computed driver-side for a probe value.
    The string canonicalization must match Spark's cast-to-string, so
    index integer/string key columns (the point-lookup types) — float
    renderings differ and are not supported."""
    s = str(value)
    out = []
    for i in range(BLOOM_K):
        h = int(hashlib.md5(f"bf{i}#{s}".encode()).hexdigest()[:15], 16)
        out.append(h % BLOOM_M)
    return out


def _load_manifest(path: str, column: str) -> dict | None:
    p = _index_path(path, column)
    if not os.path.isfile(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def build_bloom_index(spark: SparkSession, path: str, column: str) -> dict:
    """Build or incrementally refresh the Bloom index for ``column``:
    only snapshot files not yet in the manifest are scanned.  Returns
    ``{"indexed_now": n_new_files, "files_total": n_manifest_files}``.

    Build plan: one scan of the new files (value → k positions,
    exploded), ``distinct`` on (file, position) — at most m per file —
    then ONE hash aggregate on the file name; the driver only ever
    holds bitmaps (m/64 longs per file), never rows.  NULL values set
    no bits: a Bloom filter answers point lookups, and a point lookup
    is by definition for a non-NULL value.
    """
    man = _load_manifest(path, column) or {
        "column": column,
        "m": BLOOM_M,
        "k": BLOOM_K,
        "files": {},
    }
    if man["m"] != BLOOM_M or man["k"] != BLOOM_K:
        man = {"column": column, "m": BLOOM_M, "k": BLOOM_K, "files": {}}
    snap = _snapshot_files(path, None)
    missing = [f for f in snap if f not in man["files"]]
    if missing:
        df = _read_with_log_schema(spark, path, missing, None).select(
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("_f"),
            F.col(column).alias("_v"),
        )
        bits = (
            df.filter(F.col("_v").isNotNull())
            .select("_f", F.explode(_positions_expr("_v")).alias("p"))
            .distinct()
            .groupBy("_f")
            .agg(F.collect_set("p").alias("ps"))
            .collect()
        )
        by_file = {r["_f"]: r["ps"] for r in bits}
        for f in missing:
            words = [0] * _WORDS
            for p in by_file.get(f, []):
                words[p // 64] |= 1 << (p % 64)
            man["files"][f] = words
    # merge-then-publish: a concurrent builder (same column, different
    # DML) may have published while we scanned — re-load and keep its
    # entries for files we did not index ourselves, so last-writer-wins
    # cannot silently drop them (advice r8).  Bitmaps for the SAME file
    # are identical by construction (pure function of file contents),
    # so ours win harmlessly; a racing publish between this re-load and
    # the rename can still lose entries, but only back to the
    # conservative scan-everything baseline — correctness never depends
    # on the manifest.
    fresh = _load_manifest(path, column)
    if fresh and fresh["m"] == BLOOM_M and fresh["k"] == BLOOM_K:
        for f, words in fresh["files"].items():
            man["files"].setdefault(f, words)
    # atomic publish: tmp + rename (the manifest is advisory, but a
    # torn read must never look like a valid, emptier index)
    ip = _index_path(path, column)
    os.makedirs(os.path.dirname(ip), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(ip), suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        json.dump(man, fh)
    os.replace(tmp, ip)
    return {"indexed_now": len(missing), "files_total": len(man["files"])}


def read_versioned_bloom_pruned(
    spark: SparkSession, path: str, column: str, value
) -> tuple[DataFrame, int, int]:
    """Point-lookup snapshot read that skips files whose Bloom bitmap
    proves ``column = value`` cannot match; returns
    (frame, files_scanned, files_total).  No false negatives: a file
    is skipped only when some probe bit is unset, which an inserted
    value would have set.  Unindexed files (post-DML, pre-refresh) are
    conservatively scanned; deletion vectors and the exact predicate
    are applied to whatever is read.  Thin wrapper over the batched
    form — one pruning implementation, two call shapes."""
    return read_versioned_bloom_pruned_multi(spark, path, column, [value])


def read_versioned_bloom_pruned_multi(
    spark: SparkSession, path: str, column: str, values
) -> tuple[DataFrame, int, int]:
    """BATCHED point lookups: one snapshot read of the UNION of files
    any of ``values`` may live in, filtered ``column IN values`` —
    returns (frame, files_scanned, files_total).

    This is the lookup-service shape: N per-key reads cost N Spark
    jobs (fixed scheduling + footer overhead each — the dominant term
    the bench phase split exposes for small probes), while the batch
    plans ONE job over ``∪ possible(v)`` files.  The manifest
    arithmetic stays driver-side and per-key, so pruning is exactly as
    tight as N separate probes; at 10⁵ files and ~2% FP per key the
    union is ~N·(1 + FP·files) files, still ≪ the table for
    point-lookup-sized N.  Same exactness contract as the single-key
    form: no false negatives, unindexed files conservatively scanned,
    DVs + the exact IN predicate applied to whatever is read.
    """
    values = list(values)
    if not values:
        raise ValueError("values must be non-empty")
    files = _snapshot_files(path, None)
    if not files:
        raise ValueError(f"no committed data in {path}")
    man = _load_manifest(path, column)
    if man is None:
        keep = list(files)
    else:
        entries = man["files"]
        probe_sets = [_positions_py(v) for v in values]

        def may_contain_any(f: str) -> bool:
            words = entries.get(f)
            if words is None:
                return True  # not indexed → must scan
            return any(
                all(words[p // 64] >> (p % 64) & 1 for p in probes)
                for probes in probe_sets
            )

        keep = [f for f in files if may_contain_any(f)]
    if not keep:
        from .versioned import _snapshot_schema

        df = spark.createDataFrame([], _snapshot_schema(path, None))
    else:
        df = _apply_dvs(
            spark, path, _read_with_log_schema(spark, path, keep, None), None
        )
    return df.filter(F.col(column).isin(values)), len(keep), len(files)
