"""Custom Python Data Sink (Spark 4 DataSource writer API) with a
manifest commit protocol — the S4 sink re-architected for atomicity.

The reference writes CSVs with a bare ``df.to_csv`` (reference:
src/extract/f1_dataExtractor.py:178,192,245,301,329,356) — a crash
mid-write leaves a torn file.  This sink demonstrates the task/driver
commit protocol every real lakehouse sink implements:

* each TASK writes its shard to ``<path>/_tmp/<uuid>.jsonl`` and
  returns a :class:`WriterCommitMessage` naming the file and its row
  count — nothing a task writes is visible yet;
* the DRIVER's ``commit()`` renames every shard into place and swaps
  ``_MANIFEST.json`` (shard list + row counts) in LAST via atomic
  rename — readers treat the manifest as the source of truth, so a
  crash anywhere in the commit leaves the previous manifest (or none)
  intact: "nothing happened" (exactly-once visibility from
  at-least-once task attempts).  ``append`` extends the committed
  shard list; ``overwrite`` replaces it and deletes the superseded
  shards only after the new manifest is live;
* ``abort()`` removes the temp shards (the failed task's commit
  message arrives as None and is skipped).

Speculative/retried tasks therefore never corrupt output: losers'
shards stay in ``_tmp`` and are ignored.  JSONL keeps the example
dependency-free; a production sink writes parquet shards with the
identical protocol (or delegates to a table format's transaction log).
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

MANIFEST = "_MANIFEST.json"


@dataclass
class _ShardCommit(WriterCommitMessage):
    tmp_name: str
    n_rows: int


class ManifestJsonlWriter(DataSourceWriter):
    def __init__(self, path: str, schema: StructType, overwrite: bool) -> None:
        if not path:
            raise ValueError("jsonl_manifest sink requires a path")
        self.path = path
        self.fields = schema.fieldNames()
        self.overwrite = overwrite

    # -- task side ---------------------------------------------------------
    def write(self, rows: Iterator[Row]) -> _ShardCommit:
        tmp_dir = os.path.join(self.path, "_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        name = f"{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(tmp_dir, name), "w") as f:
            for r in rows:
                f.write(json.dumps(dict(zip(self.fields, r))) + "\n")
                n += 1
        return _ShardCommit(tmp_name=name, n_rows=n)

    # -- driver side -------------------------------------------------------
    def commit(self, messages: list[_ShardCommit]) -> None:
        mpath = os.path.join(self.path, MANIFEST)
        old_shards: list[dict] = []
        if os.path.exists(mpath):
            with open(mpath) as f:
                old_shards = json.load(f)["shards"]
        # append EXTENDS the committed shard list; overwrite replaces it
        shards = [] if self.overwrite else list(old_shards)
        for m in messages:
            final = f"part-{m.tmp_name}"
            os.replace(
                os.path.join(self.path, "_tmp", m.tmp_name),
                os.path.join(self.path, final),
            )
            shards.append({"file": final, "n_rows": m.n_rows})
        # manifest swap IS the commit: staged write + atomic rename, so
        # readers see the old table or the new one, never neither
        tmp_manifest = os.path.join(
            self.path, "_tmp", f"manifest-{uuid.uuid4().hex}.json"
        )
        os.makedirs(os.path.dirname(tmp_manifest), exist_ok=True)
        with open(tmp_manifest, "w") as f:
            json.dump(
                {"shards": shards, "n_rows": sum(s["n_rows"] for s in shards)},
                f,
            )
        os.replace(tmp_manifest, mpath)
        if self.overwrite:
            # old shards are deleted only AFTER the new manifest is
            # live — a crash here leaves invisible orphans, not a
            # missing table
            live = {s["file"] for s in shards}
            for s in old_shards:
                if s["file"] not in live:
                    try:
                        os.remove(os.path.join(self.path, s["file"]))
                    except FileNotFoundError:
                        pass

    def abort(self, messages: list[_ShardCommit]) -> None:
        tmp_dir = os.path.join(self.path, "_tmp")
        for m in messages:
            if m is None:  # the failed task that triggered the abort
                continue
            try:
                os.remove(os.path.join(tmp_dir, m.tmp_name))
            except FileNotFoundError:
                pass


class ManifestJsonlDataSource(DataSource):
    """``df.write.format("jsonl_manifest").mode(...).save(path)``"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema: StructType, overwrite: bool) -> ManifestJsonlWriter:
        return ManifestJsonlWriter(
            self.options.get("path"), schema, overwrite
        )


def register_sink(spark) -> None:
    """Idempotent registration of the manifest sink."""
    spark.dataSource.register(ManifestJsonlDataSource)


def read_committed(spark, path: str):
    """Read ONLY what the manifest declares committed — torn shards in
    ``_tmp`` (from crashed or speculative tasks) are invisible."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    files = [os.path.join(path, s["file"]) for s in manifest["shards"]]
    return spark.read.json(files) if files else None
