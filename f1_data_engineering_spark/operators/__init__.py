"""Query layer — every operator family from SURVEY.md §2 as a named
DataFrame function over the driver's test tables, plus the F1-native
dashboard/telemetry queries and the beyond-reference training-data ops.

Each public function takes ``(spark, sf_dir)`` and returns a lazy
DataFrame; ``__spark_entry__.queries()`` re-exports them for the
driver's DuckDB-oracle differential check.
"""
