"""f1_data_engineering_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of the
reference repo ``SaiSurya3003/F1_Data_Engineering`` (an eager single-process
pandas ETL pipeline), re-architected for Apache Spark:

* typed lakehouse data model (Parquet + explicit ``StructType`` schemas)
  instead of CSV string round-trips,
* declarative DataFrame/SQL plans optimized by Catalyst (predicate pushdown,
  column pruning, broadcast join selection, AQE) instead of pandas row loops,
* the reference's domain logic (duration parse/format, session-time shifts,
  boolean normalization) re-expressed as pure ``Column -> Column`` expression
  functions — zero Python UDFs on the reference-parity path,
* Structured Streaming for the telemetry/event stream surface,
* beyond-reference large-scale training-data operators (dedup, similarity
  search, text analysis, multimodal plumbing).

Layout:

* :mod:`.session`    — SparkSession factory tuned for the target cluster
* :mod:`.schemas`    — explicit schemas: 6 F1 tables + 10 driver test tables
* :mod:`.functions`  — expression library (time formats, booleans, text,
  vectors) — SURVEY.md §2.8
* :mod:`.sources`    — scan/sink layer (CSV w/ null tokens, partitioned
  Parquet, catalog) — SURVEY.md §2.1
* :mod:`.operators`  — the query layer: every operator in SURVEY.md §2
  as a named DataFrame function
* :mod:`.streaming`  — Structured Streaming surface — SURVEY.md §2.9
* :mod:`.plans`      — plan introspection helpers (explain capture,
  pushdown / broadcast assertions used by tests)
"""

__version__ = "0.1.0"
