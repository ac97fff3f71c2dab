"""Test-table registry: load the driver's parquet tables with explicit schemas.

The scan layer for the TPC-H-ish correctness tables (TESTDATA.md).
Schemas are asserted, not inferred, so Catalyst can prune columns and
push predicates into the Parquet reader with full type information.

Scale note: at 100 TB these tables would be partitioned (orders/lineitem
by date, events by ts-date) and the loader would pick up partition
columns automatically; the API here is path-based so that swap is a
config change, not a code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TEST_TABLES, TEST_TABLE_NAMES

__all__ = ["load_table", "load_tables", "register_views", "default_sf_dir", "spread"]

#: Timestamp columns whose parquet time unit must be sniffed from the
#: footer before the read schema is fixed.  Spark has no nanosecond
#: timestamp type: a TIMESTAMP(NANOS) column must be read as raw INT64
#: and truncated to microseconds, while a TIMESTAMP(MICROS) column is
#: read natively as TimestampType.  The driver has shipped BOTH
#: encodings for ``events.ts`` across rounds, so the unit is detected
#: per file (one driver-side footer read, cached) instead of assumed —
#: assuming nanos against micros data silently lands every event in
#: 1970.  Cost of the nanos path at scale: a ts predicate no longer
#: prunes parquet row groups (the filter applies post-conversion) —
#: for a real deployment, land the data as TIMESTAMP(MICROS).
SNIFF_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

#: (path, probe mtime) → tuple of column names nano-encoded in that
#: file.  The mtime key invalidates the sniff when a table is rewritten
#: in-process with a different encoding (regenerated test data) — a
#: stale unit would silently re-introduce the 1970-collapse this sniff
#: exists to prevent.
_NANO_CACHE: dict[tuple[str, float], tuple[str, ...]] = {}

#: epoch-nanos magnitude window: ~1973..2128.  A raw un-annotated INT64
#: holding epoch-micros (~1e15) or -millis (~1e12) must NOT take the
#: div-1000 path.
_NANOS_MIN, _NANOS_MAX = 10**17, 5 * 10**18


def _nano_cols(path: str, candidates: tuple[str, ...]) -> tuple[str, ...]:
    """Columns among ``candidates`` stored as epoch-nanos in ``path``."""
    if not candidates:
        return ()
    import glob

    import pyarrow.parquet as pq

    # Spark-written tables are directories of part files; the footer
    # of any one part carries the column encoding.
    probe = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return ()
        probe = parts[0]
    try:
        key = (path, os.path.getmtime(probe))
    except OSError:
        key = (path, -1.0)
    if key not in _NANO_CACHE:
        import pyarrow as pa

        pf = pq.ParquetFile(probe)
        arrow_schema = pq.read_schema(probe)
        physical = pf.schema  # parquet-level types
        phys_by_name = {
            physical.column(i).name: physical.column(i).physical_type
            for i in range(len(physical.names))
        }
        nano = []
        for name in candidates:
            if name not in arrow_schema.names:
                continue
            t = arrow_schema.field(name).type
            # Long-read path only for columns PHYSICALLY stored as
            # INT64 whose values are epoch-nanos: TIMESTAMP(NANOS), or
            # a raw un-annotated INT64 from legacy landed files.  INT96
            # also surfaces as timestamp[ns] in arrow but must be read
            # natively as TimestampType, so gate on the physical type.
            if phys_by_name.get(name) != "INT64":
                continue
            if getattr(t, "unit", None) == "ns":
                nano.append(name)
            elif pa.types.is_int64(t) and _int64_looks_nanos(pf, name):
                nano.append(name)
        _NANO_CACHE[key] = tuple(nano)
    return _NANO_CACHE[key]


def _int64_looks_nanos(pf, name: str) -> bool:
    """Magnitude sanity check for RAW (un-annotated) INT64 candidates:
    only epoch-nanos values (~1e18) take the div-1000 path; a legacy
    epoch-micros/-millis column would otherwise land decades wrong.
    Prefers the row-group statistics footer; falls back to reading one
    value from the first row group."""
    try:
        md = pf.metadata
        idx = pf.schema_arrow.get_field_index(name)
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(idx)
            stats = col.statistics
            if stats is not None and stats.has_min_max:
                return _NANOS_MIN <= abs(int(stats.max)) <= _NANOS_MAX
        first = pf.read_row_group(0, columns=[name]).column(0)
        for v in first:
            if v.is_valid:
                return _NANOS_MIN <= abs(v.as_py()) <= _NANOS_MAX
    except Exception:
        pass
    # no evidence either way: keep the historical nanos assumption
    return True


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of a test table from its parquet footers —
    driver-side metadata arithmetic, no Spark job.  Used where a count
    only SIZES something (scratch-lake seed file counts): the footer
    number equals ``df.count()`` by the parquet contract, at ~ms
    instead of a scheduled scan."""
    if name not in TEST_TABLES:
        raise KeyError(f"unknown test table {name!r}; known: {TEST_TABLE_NAMES}")
    import glob

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    parts = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    return sum(pq.ParquetFile(p).metadata.num_rows for p in parts)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table as a DataFrame with its declared schema."""
    if name not in TEST_TABLES:
        raise KeyError(f"unknown test table {name!r}; known: {TEST_TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = TEST_TABLES[name]
    ns_cols = _nano_cols(path, SNIFF_TS_COLS.get(name, ()))
    if not ns_cols:
        return spark.read.schema(schema).parquet(path)
    read_schema = T.StructType(
        [
            T.StructField(
                f.name,
                T.LongType() if f.name in ns_cols else f.dataType,
                f.nullable,
            )
            for f in schema.fields
        ]
    )
    df = spark.read.schema(read_schema).parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition ``df`` on ``key`` to the session's default
    parallelism, decoupling COMPUTE parallelism from input BYTE layout.

    Spark sizes scan partitions by ``spark.sql.files.maxPartitionBytes``
    — the right unit for I/O-bound scans, the wrong one for stages
    whose per-byte cost is enormous (an md5 per token, a regex parse
    per row).  A small single-row-group parquet file otherwise pins
    the whole hash/regex stage to ONE core.  The shuffle this inserts
    moves only the narrow projection the caller prepared, and the
    operators that use it all shuffle (or are order-insensitive)
    downstream anyway.

    At 100 TB the scan naturally yields thousands of partitions and
    this becomes a near-no-op rebalance; the guard against tiny inputs
    is deliberate — partition count is capped by the data only when
    the data is smaller than the core count.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(key))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TEST_TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TEST_TABLE_NAMES
) -> None:
    """Register each table as a temp view so spark.sql() can address it."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
