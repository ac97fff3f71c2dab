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

* **Index layout** — ``<table>/_bloom/<column>/shard-<uuid>.json``:
  each build publishes ONE immutable shard holding m/k parameters
  plus the m-bit bitmaps (as 64-bit words) of the files IT indexed;
  the manifest is the UNION of the shards.  Everything lives OUTSIDE
  the transaction log (the log's snapshot arithmetic never sees it; a
  reader without the index just scans — the index is an optimization,
  never a correctness input).  The pre-round-10 single-file layout
  (``<table>/_bloom/<column>.json``) is still read and is migrated
  into a shard on the next build.
* **Incremental build** — :func:`build_bloom_index` scans only
  snapshot files MISSING from the union and writes only their shard,
  so a refresh on a table with 10⁵ already-indexed files costs one
  scan of the new files and O(new files) manifest bytes — never a
  read-modify-write of the whole index (the round-9 single-file
  manifest was exactly that trap: every build rewrote ~200 MB at the
  module's own 100 TB arithmetic).  Concurrent builders write
  DISTINCT shards, so there is no publish race to merge around at
  all; bitmaps for the same file are identical by construction.
* **Compaction** — entries for files that left the snapshot
  (compacted / rewritten / vacuumed) are dropped by folding all
  shards into one when the stale mass passes half the live mass (or
  the shard count passes a cap), which bounds the manifest at ~1.5×
  the live entries and keeps the drop cost amortized O(new) per
  build.  Dropping is always safe: readers conservatively scan
  unindexed files.
* **Lookup** — :func:`read_versioned_bloom_pruned` tests the k bit
  positions of the probe value driver-side against each file's bitmap
  (manifest-sized work), scans only possible files (unindexed files
  are conservatively scanned), applies deletion vectors, and filters
  exactly — the Bloom filter decides which FILES can be skipped,
  never which rows qualify.  Shards are immutable, so the parsed form
  is cached on the driver per (path, mtime, size): steady-state
  probes re-stat the shards and parse nothing.

Bit positions use the repo's engine-neutral md5 recipe (first 15 hex
chars as a 60-bit int), computed by Spark expressions at build time
and by ``hashlib`` at probe time — identical by construction, which
``tests/test_bloomindex.py`` pins along with the no-false-negative
property under appends, CoW rewrites, and MoR deletes.

Sizing: m = 2^14 bits and k = 6 give a false-positive rate of
~0.03% at ~800 distinct values/file and ~2% at ~2000 (the standard
(1 - e^(-kn/m))^k estimate; k = 6 is within rounding of the optimal
(m/n)·ln 2 at n = 2000), at 2 KB/file of index — at 100 TB / 1 GB
files that is ~200 MB of manifest for the whole table, parsed once
per process and re-validated by stat.  The in-query pruning
assertions in ``operators/lakeperf.py`` bound an absent key's scan at
HALF the files, so even the 2000-values/file regime carries a ~25×
margin.  Shards built under a different (m, k) are ignored by the
union (their files re-index as missing) and removed at the next
compaction.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import tempfile
import uuid

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

_SHARD_RE = re.compile(r"^shard-[0-9a-f]{32}\.json$")

#: Compact the shard set when it grows past this many files even with
#: little stale mass — probe cost has an O(shards) stat component.
_MAX_SHARDS = 32


def _index_path(path: str, column: str) -> str:
    """Legacy single-file manifest (pre-sharding; read-only)."""
    return os.path.join(path, "_bloom", f"{column}.json")


def _index_dir(path: str, column: str) -> str:
    return os.path.join(path, "_bloom", column)


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


#: Parsed-shard cache keyed by absolute path → ((mtime_ns, size),
#: parsed dict).  Shards (and the legacy file) are immutable once
#: published (tmp + rename to a unique name), so a steady-state probe
#: costs one os.stat per shard and zero JSON parsing.
_SHARD_CACHE: dict[str, tuple[tuple[int, int], dict]] = {}


def _read_shard(full: str) -> dict | None:
    try:
        st = os.stat(full)
        key = (st.st_mtime_ns, st.st_size)
    except FileNotFoundError:
        return None  # compacted away under a concurrent reader — safe
    hit = _SHARD_CACHE.get(full)
    if hit is not None and hit[0] == key:
        return hit[1]
    try:
        with open(full) as fh:
            man = json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        return None
    if len(_SHARD_CACHE) >= 4096:
        _SHARD_CACHE.clear()
    _SHARD_CACHE[full] = (key, man)
    return man


def _shard_paths(path: str, column: str) -> list[str]:
    """All manifest source files, legacy first then shards sorted by
    name (order is cosmetic: same-file bitmaps are identical)."""
    out = []
    legacy = _index_path(path, column)
    if os.path.isfile(legacy):
        out.append(legacy)
    d = _index_dir(path, column)
    if os.path.isdir(d):
        out.extend(
            os.path.join(d, n)
            for n in sorted(os.listdir(d))
            if _SHARD_RE.match(n)
        )
    return out


def _load_manifest(path: str, column: str) -> dict | None:
    """The merged manifest view: union of every valid shard (and the
    legacy file) under the CURRENT (m, k).  None when nothing is
    indexed.  Shards under a different (m, k) are ignored — their
    files read as unindexed (conservative scan) until a rebuild."""
    files: dict = {}
    found = False
    for p in _shard_paths(path, column):
        man = _read_shard(p)
        if not man or man.get("m") != BLOOM_M or man.get("k") != BLOOM_K:
            continue
        found = True
        files.update(man["files"])
    if not found:
        return None
    return {"column": column, "m": BLOOM_M, "k": BLOOM_K, "files": files}


def _publish_shard(path: str, column: str, files: dict) -> str:
    """Atomically publish one immutable shard; returns its full path."""
    d = _index_dir(path, column)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        json.dump(
            {"column": column, "m": BLOOM_M, "k": BLOOM_K, "files": files}, fh
        )
    full = os.path.join(d, f"shard-{uuid.uuid4().hex}.json")
    os.replace(tmp, full)
    return full


def build_bloom_index(spark: SparkSession, path: str, column: str) -> dict:
    """Build or incrementally refresh the Bloom index for ``column``:
    only snapshot files not yet in the manifest union are scanned, and
    only their bitmaps are written (one new shard) — build cost and
    bytes written are O(new files), never O(table files).  Returns
    ``{"indexed_now": n_new_files, "files_total": n_manifest_files,
    "pruned_entries": n_dropped_stale, "shards": n_shard_files}``.

    Build plan: one scan of the new files (value → k positions,
    exploded), ``distinct`` on (file, position) — at most m per file —
    then ONE hash aggregate on the file name; the driver only ever
    holds bitmaps (m/64 longs per file), never rows.  NULL values set
    no bits: a Bloom filter answers point lookups, and a point lookup
    is by definition for a non-NULL value.

    Housekeeping folds the shard set into one when (a) stale entries
    (files no longer in the snapshot) outweigh half the live ones,
    (b) the shard count passes ``_MAX_SHARDS``, or (c) legacy /
    wrong-(m, k) sources exist (migration).  Only the sources THIS
    build read are removed, so a concurrent builder's freshly
    published shard always survives; a concurrent reader that listed
    the old shards either still reads them (removal happens after the
    fold is published) or falls back to conservative scanning —
    correctness never depends on the manifest.
    """
    snap = _snapshot_files(path, None)
    snap_set = set(snap)
    sources = _shard_paths(path, column)
    view: dict = {}
    bad_sources = []
    for p in sources:
        man = _read_shard(p)
        if not man or man.get("m") != BLOOM_M or man.get("k") != BLOOM_K:
            bad_sources.append(p)
            continue
        view.update(man["files"])
    missing = [f for f in snap if f not in view]
    new_entries: dict = {}
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
            new_entries[f] = words

    stale = [f for f in view if f not in snap_set]
    live = len(view) - len(stale)
    legacy = _index_path(path, column)
    must_fold = (
        bool(bad_sources)
        or legacy in sources
        or len(sources) + (1 if new_entries else 0) > _MAX_SHARDS
        or (stale and len(stale) > max(4, live // 2))
    )
    pruned = 0
    if must_fold:
        folded = {f: w for f, w in view.items() if f in snap_set}
        folded.update(new_entries)
        pruned = len(stale)
        _publish_shard(path, column, folded)
        for p in sources:  # only what WE read — concurrent shards survive
            try:
                os.remove(p)
            except FileNotFoundError:
                pass
        total = len(folded)
    else:
        if new_entries:
            _publish_shard(path, column, new_entries)
        total = len(view) + len(new_entries)
    return {
        "indexed_now": len(missing),
        "files_total": total,
        "pruned_entries": pruned,
        "shards": len(_shard_paths(path, column)),
    }


def read_versioned_bloom_pruned(
    spark: SparkSession,
    path: str,
    column: str,
    value,
    version: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Point-lookup snapshot read that skips files whose Bloom bitmap
    proves ``column = value`` cannot match; returns
    (frame, files_scanned, files_total).  No false negatives: a file
    is skipped only when some probe bit is unset, which an inserted
    value would have set.  Unindexed files (post-DML, pre-refresh —
    or belonging to a TIME-TRAVELED snapshot whose entries were folded
    out of the manifest) are conservatively scanned; deletion vectors
    and the exact predicate are applied to whatever is read.  Thin
    wrapper over the batched form — one pruning implementation, two
    call shapes."""
    return read_versioned_bloom_pruned_multi(
        spark, path, column, [value], version=version
    )


def read_versioned_bloom_pruned_multi(
    spark: SparkSession,
    path: str,
    column: str,
    values,
    version: int | None = None,
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
    files = _snapshot_files(path, version)
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

        df = spark.createDataFrame([], _snapshot_schema(path, version))
    else:
        df = _apply_dvs(
            spark,
            path,
            _read_with_log_schema(spark, path, keep, version),
            version,
        )
    return df.filter(F.col(column).isin(values)), len(keep), len(files)
