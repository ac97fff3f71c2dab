"""Lake ACCESS-PATH operators as registered, oracle-checked queries:
the Bloom point-lookup index and the OPTIMIZE ZORDER rewrite exercised
end-to-end on a scratch versioned lake, with their pruning claims
enforced IN the query (a broken skip-path raises; a wrong result flips
the oracle hash).

Verification shape (same contract as operators/lakedml.py): the query
builds the lake, runs the real maintenance op, reads back THROUGH the
pruned access path, and summarizes row values; DuckDB re-derives the
expected rows declaratively from ``orders``.  The file-skipping counts
are implementation detail the oracle cannot see, so the query asserts
them itself — `scanned` bounds that hold with wide margins at every
test SF (sized by the seeding logic below) — making a silent
no-pruning regression a hard failure rather than a quiet slowdown.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import bloomindex as BI
from ..sources import versioned as V
from ..sources.registry import load_table, table_row_count
from .lakedml import _ck_hash, _pin, _state_summary
from .layout import zorder_versioned

#: Target rows per data file for the scratch lakes.  Worst case for
#: the Bloom index is ~2000 DISTINCT keys/file (hash-shuffled orders
#: at the larger SFs), which at m=2^14, k=6 is a ~2% false-positive
#: rate ((1-e^(-kn/m))^k) — a ~25× margin under the scanned ≤ total/2
#: sentinel assertions below.  (At the former m=2^13 the same load was
#: ~20% FP — a real rate the 1/2 bound still absorbed, but with ~4×
#: less headroom than the comments claimed; advice r8.)
_ROWS_PER_FILE = 2000


def _seed_files(n_rows: int, floor: int = 8) -> int:
    return max(floor, n_rows // _ROWS_PER_FILE)


def bloom_point_lookup_orders(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str | None = None,
    phase_times: dict | None = None,
) -> DataFrame:
    """Point lookups through the per-file Bloom index: seed a scratch
    lake from ``orders`` HASH-SHUFFLED on a non-key column (so min/max
    stats cannot prune — every file spans the whole custkey range),
    build the ``o_custkey`` Bloom index, then look up the five smallest
    distinct custkeys plus one ABSENT sentinel key through
    ``read_versioned_bloom_pruned``.

    The oracle certifies the looked-up ROWS (count/checksum/price per
    probed key, incl. the sentinel's empty row); the query itself
    asserts the skip-path: the absent key's scan count is pure false
    positives and must stay under half the file count (at the sized
    ~2000 rows/file the expected FP rate is ≈2%), which a saturated
    bitmap, a hash mismatch between build and probe, or a manifest
    regression would all violate.
    """
    import time as _time

    tmp = work_dir or tempfile.mkdtemp(prefix="bloom_lkp_")
    try:
        t0 = _time.time()
        t = os.path.join(tmp, "orders_lake")
        orders = load_table(spark, sf_dir, "orders")
        # footer-count sizing: no Spark job (registry.table_row_count)
        n = table_row_count(sf_dir, "orders")
        V.write_versioned(
            orders.repartition(_seed_files(n), "o_totalprice"),
            t,
            mode="overwrite",
        )
        t1 = _time.time()
        BI.build_bloom_index(spark, t, "o_custkey")
        t2 = _time.time()
        probes = [
            r[0]
            for r in orders.filter(F.col("o_custkey").isNotNull())
            .select("o_custkey")
            .distinct()
            .orderBy("o_custkey")
            .limit(5)
            .collect()
        ]
        sentinel = (
            orders.agg(F.max("o_custkey")).first()[0] or 0
        ) + 999_983  # absent by construction
        def probe_one(key) -> DataFrame:
            df, scanned, total = BI.read_versioned_bloom_pruned(
                spark, t, "o_custkey", key
            )
            if key == sentinel and scanned > total // 2:
                raise AssertionError(
                    f"bloom skip-path regression: absent key scanned "
                    f"{scanned}/{total} files"
                )
            return _pin(
                spark,
                df.agg(
                    F.lit(key).cast("long").alias("o_custkey"),
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum(_ck_hash().cast("decimal(38,0)"))
                    .cast("string")
                    .alias("checksum"),
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                    .cast("double")
                    .alias("sum_price"),
                ),
            )

        # the six per-key lookups are independent Spark jobs whose cost
        # is ~all fixed scheduling + footer overhead; overlap them from
        # a small driver pool (guide §2.6) — results are pinned frames,
        # list order (and the final orderBy) keeps output deterministic
        from concurrent.futures import ThreadPoolExecutor
        from functools import reduce

        with ThreadPoolExecutor(max_workers=3) as pool:
            outs = list(pool.map(probe_one, probes + [sentinel]))

        out = _pin(
            spark, reduce(DataFrame.unionByName, outs).orderBy("o_custkey")
        )
        if phase_times is not None:
            # ~all of the registered query's wall time is harness
            # (scratch-lake seed + index build); the probe path a user
            # actually pays per lookup is the last phase alone
            phase_times["seed"] = round(t1 - t0, 3)
            phase_times["index_build"] = round(t2 - t1, 3)
            phase_times["probe"] = round(_time.time() - t2, 3)
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_BLOOM_LOOKUP = """
WITH probes AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_custkey IS NOT NULL
  ORDER BY o_custkey LIMIT 5
),
all_probes AS (
  SELECT o_custkey FROM probes
  UNION ALL
  SELECT (SELECT COALESCE(MAX(o_custkey), 0) + 999983 FROM orders)
)
SELECT p.o_custkey, CAST(COUNT(o.o_custkey) AS BIGINT) AS n_rows,
  -- unmatched probe rows must sum to NULL, not to the hash of an
  -- all-null-token row the COALESCEs would otherwise fabricate
  CAST(SUM(CASE WHEN o.o_custkey IS NULL THEN NULL ELSE
    CAST(CAST(('0x' || substr(md5('dml#' || concat_ws(chr(31),
    COALESCE(CAST(o.o_orderkey AS VARCHAR), chr(0) || 'null'),
    COALESCE(CAST(o.o_custkey AS VARCHAR), chr(0) || 'null'),
    COALESCE(CAST(o.o_orderstatus AS VARCHAR), chr(0) || 'null'),
    COALESCE(CAST(o.o_orderpriority AS VARCHAR), chr(0) || 'null'))), 1, 15))
    AS BIGINT) AS DECIMAL(38,0)) END) AS VARCHAR) AS checksum,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM all_probes p LEFT JOIN orders o ON o.o_custkey = p.o_custkey
GROUP BY p.o_custkey ORDER BY p.o_custkey
"""


def zorder_pruning_orders(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str | None = None,
    phase_times: dict | None = None,
) -> DataFrame:
    """OPTIMIZE ZORDER end-to-end: seed a scratch lake hash-shuffled
    (min/max stats prune nothing), rewrite it z-ordered on
    (o_custkey, order day), then answer a 1/16-wide range query on
    EACH dimension through ``read_versioned_pruned`` — the property a
    single-column sort cannot deliver.

    The oracle certifies the range results (rows surviving the skip
    must be exactly the predicate's rows); the query asserts the
    skip-path itself: each dimension's pruned read must skip at least
    a quarter of the files (z-tiles are narrow in BOTH dims; expected
    skipping is ~3/4 per dim, so the bound has wide margin).
    """
    import time as _time

    tmp = work_dir or tempfile.mkdtemp(prefix="zorder_rng_")
    try:
        t0 = _time.time()
        t = os.path.join(tmp, "orders_lake")
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_orderpriority",
            "o_totalprice",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1990-01-01").cast("date"),
            )
            .cast("long")
            .alias("day"),
        )
        # ONE stats pass serves both the file sizing and the probe
        # bounds (was a count job + a min/max job over the same scan)
        b = orders.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_custkey").alias("minc"),
            F.max("o_custkey").alias("maxc"),
            F.min("day").alias("mind"),
            F.max("day").alias("maxd"),
        ).first()
        n_files = _seed_files(b["n"], floor=16)
        V.write_versioned(
            orders.repartition(n_files, "o_totalprice"), t, mode="overwrite"
        )
        t1 = _time.time()
        zorder_versioned(spark, t, "o_custkey", "day", n_files=n_files)
        t2 = _time.time()
        spans = {
            "01_custkey_range": (
                "o_custkey",
                b["minc"],
                b["minc"] + (b["maxc"] - b["minc"]) // 16,
            ),
            "02_day_range": (
                "day",
                b["mind"],
                b["mind"] + (b["maxd"] - b["mind"]) // 16,
            ),
        }
        def probe_one(item) -> DataFrame:
            stage, (col, lo, hi) = item
            df, scanned, total = V.read_versioned_pruned(spark, t, col, lo, hi)
            if scanned > (3 * total) // 4:
                raise AssertionError(
                    f"z-order skip-path regression on {col}: scanned "
                    f"{scanned}/{total} files for a 1/16 range"
                )
            return _pin(spark, _state_summary(df, F.lit(stage), "stage"))

        # the two range probes are independent jobs — overlap them
        # (guide §2.6); the final orderBy("stage") fixes output order
        from concurrent.futures import ThreadPoolExecutor
        from functools import reduce

        with ThreadPoolExecutor(max_workers=2) as pool:
            outs = list(pool.map(probe_one, spans.items()))

        out = _pin(spark, reduce(DataFrame.unionByName, outs).orderBy("stage"))
        if phase_times is not None:
            phase_times["seed"] = round(t1 - t0, 3)
            phase_times["optimize_zorder"] = round(t2 - t1, 3)
            phase_times["probe"] = round(_time.time() - t2, 3)
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_ZORDER_PRUNING = """
WITH d AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
         o_totalprice,
         datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day
  FROM orders
),
b AS (
  SELECT MIN(o_custkey) AS minc, MAX(o_custkey) AS maxc,
         MIN(day) AS mind, MAX(day) AS maxd
  FROM d
),
stages AS (
  SELECT '01_custkey_range' AS stage, d.* FROM d, b
  WHERE d.o_custkey BETWEEN b.minc AND b.minc + (b.maxc - b.minc) // 16
  UNION ALL
  SELECT '02_day_range' AS stage, d.* FROM d, b
  WHERE d.day BETWEEN b.mind AND b.mind + (b.maxd - b.mind) // 16
)
SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CAST(CAST(('0x' || substr(md5('dml#' || concat_ws(chr(31),
    COALESCE(CAST(o_orderkey AS VARCHAR), chr(0) || 'null'),
    COALESCE(CAST(o_custkey AS VARCHAR), chr(0) || 'null'),
    COALESCE(CAST(o_orderstatus AS VARCHAR), chr(0) || 'null'),
    COALESCE(CAST(o_orderpriority AS VARCHAR), chr(0) || 'null'))), 1, 15))
    AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) AS checksum,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM stages GROUP BY stage ORDER BY stage
"""
