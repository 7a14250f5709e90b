"""PySpark-native analytics engine with the capabilities of the
``jinavarrete/datawarehouse_vehicule_insurance`` reference (a pandas medallion
ETL for vehicle-insurance analytics), re-expressed Spark-first.

Layers (SURVEY.md §7.1):

- :mod:`.catalog`    — explicit schema registry + zone (bronze/silver/gold) paths.
- :mod:`.sources`    — CSV/Parquet scans & sinks, seeded dirty-fixture generator.
- :mod:`.functions`  — scalar column functions (text normalize, validate, dates).
- :mod:`.operators`  — declarative cleaning-rule engine, gold dimensional
  builders, dedup / similarity / text-analysis operators for large-scale
  training-data pipelines.
- :mod:`.plans`      — pipeline runner (bronze → silver → gold) with per-table
  error isolation, mirroring the reference's continue-on-error loop
  (reference: scripts/bronze/load_bronze.py:88-101).
- :mod:`.streaming`  — Structured Streaming ingestion of event streams
  (additive scope; the reference is batch-only).

Everything is lazy DataFrame construction — Catalyst does predicate pushdown,
column pruning, broadcast selection and AQE re-planning; no hand-scheduling.
"""

from datawarehouse_vehicule_insurance_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
