"""Custom Python Data Source (Spark 4 DataSource API) — SURVEY.md S1.

The reference's ingestion boundary is a remote-API pull
(``fastf1.get_session(...)``, reference: src/extract/f1_dataExtractor.py:123-124)
executed by a serial driver loop.  Re-architected for Spark, ingestion
is a PLUGGABLE DATA SOURCE: ``spark.read.format("f1_telemetry")`` plans
one input partition per driver (the natural fetch unit — per-driver
telemetry slices), executes the fetches IN PARALLEL on executors, and
participates in filter pushdown so a single-driver query never touches
the other drivers' partitions.

The container has no network, so the "fetch" is a deterministic
synthetic telemetry generator (seeded integer arithmetic — stable
across runs, partitionings and retries); a production implementation
swaps `_gen_rows` for the HTTP/cache call and keeps every structural
piece: schema, partition planning, pushdown, serialization.

Scale notes:

* partitions() returns one :class:`InputPartition` per driver —
  parallelism = drivers per session; a 1000-session backfill composes
  with a session-batch loop or a union of reads, each still
  partition-parallel.  No 5-second driver-side sleeps between sessions
  (reference: f1_dataExtractor.py:405) — rate limiting belongs in the
  fetch layer, per-partition, where it overlaps across executors.
* pushFilters() consumes ``driver = 'X'`` / ``driver IN (...)``
  equality predicates by PRUNING PARTITIONS before any row is
  generated — the Python-source analogue of partition pruning; all
  other predicates are returned to Spark to evaluate post-scan.
* rows stream out as plain tuples; Spark Arrow-batches them. Payload
  width is the schema below (9 narrow columns), so the Python→JVM hop
  is bandwidth-light.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

#: Synthetic session drivers (three-letter codes, reference-shaped).
DRIVERS = ("ALO", "HAM", "LEC", "NOR", "PER", "RUS", "SAI", "VER")

SCHEMA_DDL = (
    "driver string, lap int, sample int, ts_offset double, "
    "speed double, rpm int, throttle double, brake boolean, gear int"
)

#: Samples per lap and laps per driver for the synthetic session.
LAPS = 5
SAMPLES = 40


def _gen_rows(driver: str, laps: int, samples: int) -> Iterator[tuple]:
    """Deterministic per-driver telemetry stream (integer arithmetic
    only — bit-stable everywhere).  Replace with the real fetch."""
    seed = sum(ord(c) * 131**i for i, c in enumerate(driver)) % 97
    for lap in range(1, laps + 1):
        for s in range(samples):
            t = (lap - 1) * samples + s
            phase = (t * 7 + seed) % 100
            speed = 80.0 + phase * 2.4  # 80..318 km/h pseudo-profile
            rpm = 9000 + phase * 30
            throttle = min(1.0, phase / 60.0)
            brake = phase < 12
            gear = 2 + phase * 6 // 100
            yield (
                driver,
                lap,
                s,
                round(t * 0.25 + seed * 0.001, 3),
                round(speed, 1),
                rpm,
                round(throttle, 3),
                brake,
                gear,
            )


class _DriverPartition(InputPartition):
    def __init__(self, driver: str) -> None:
        self.driver = driver


class TelemetryReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.laps = int(options.get("laps", LAPS))
        self.samples = int(options.get("samples", SAMPLES))
        self._drivers: tuple[str, ...] = DRIVERS

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume driver-equality predicates as partition pruning;
        everything else goes back to Spark."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("driver",):
                self._drivers = tuple(
                    d for d in self._drivers if d == f.value
                )
            elif isinstance(f, In) and f.attribute == ("driver",):
                keep = set(f.value)
                self._drivers = tuple(
                    d for d in self._drivers if d in keep
                )
            else:
                yield f  # unsupported here — Spark evaluates it

    def partitions(self) -> Sequence[InputPartition]:
        return [_DriverPartition(d) for d in self._drivers]

    def read(self, partition: _DriverPartition) -> Iterator[tuple]:
        return _gen_rows(partition.driver, self.laps, self.samples)


class TelemetryDataSource(DataSource):
    """``spark.read.format("f1_telemetry").option("laps", 5).load()``"""

    @classmethod
    def name(cls) -> str:
        return "f1_telemetry"

    def schema(self) -> str | StructType:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> TelemetryReader:
        return TelemetryReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom source."""
    spark.dataSource.register(TelemetryDataSource)


# ---------------------------------------------------------------------------
# streaming leg: live-session ingest, one lap per micro-batch
# ---------------------------------------------------------------------------


class TelemetryStreamReader(SimpleDataSourceStreamReader):
    """Lap-by-lap streaming ingest (the reference's unimplemented
    "real-time updates during live sessions" wish, README.md:357).

    Offset = laps published so far (``{"lap": n}``): exactly-once
    replay is free because generation is a pure function of the lap
    number — ``readBetweenOffsets`` re-derives any batch bit-for-bit
    after a restart, which is precisely the property a real fetch
    layer must provide (idempotent range reads against the timing API
    or its cache).  The stream is FINITE (``max_laps``) so tests and
    availableNow-style drains terminate.
    """

    def __init__(self, options: dict) -> None:
        self.samples = int(options.get("samples", SAMPLES))
        self.max_laps = int(options.get("max_laps", LAPS))

    def initialOffset(self) -> dict:
        return {"lap": 0}

    def _lap_rows(self, lap: int) -> Iterator[tuple]:
        for d in DRIVERS:
            for row in _gen_rows(d, 1, self.samples):
                # _gen_rows emits lap=1; rebase to the requested lap
                yield (d, lap, *row[2:])

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lap = int(start["lap"])
        if lap >= self.max_laps:
            return [], {"lap": lap}
        # a LIST, not a generator: the prefetched batch is pickled into
        # the stream's offset cache, and generators don't pickle
        return list(self._lap_rows(lap + 1)), {"lap": lap + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for lap in range(int(start["lap"]) + 1, int(end["lap"]) + 1):
            yield from self._lap_rows(lap)


class TelemetryStreamDataSource(DataSource):
    """``spark.readStream.format("f1_telemetry_stream").load()``"""

    @classmethod
    def name(cls) -> str:
        return "f1_telemetry_stream"

    def schema(self) -> str | StructType:
        return SCHEMA_DDL

    def simpleStreamReader(self, schema: StructType) -> TelemetryStreamReader:
        return TelemetryStreamReader(self.options)


def register_stream(spark) -> None:
    """Idempotent registration of the streaming source."""
    spark.dataSource.register(TelemetryStreamDataSource)
