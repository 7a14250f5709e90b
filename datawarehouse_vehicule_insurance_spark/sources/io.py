"""Scans and sinks (SURVEY.md §2.1 S1-S5).

The reference moves whole tables through boto3 one buffer at a time
(reference: scripts/bronze/load_bronze.py:45-71, load_silver.py:28-51);
here the s3a/file connectors give split reads and distributed writes.
All writes are ``mode=overwrite``, matching the reference's full-table
overwrite-per-run semantics; ``partition_by`` is the engine's scale
upgrade (date-partitioned facts → Catalyst partition pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Header CSV scan (reference: load_bronze.py:31-43). Schema should be
    declared (catalog registry) — inference is a second full scan at
    100 TB; ``schema=None`` falls back to inference for ad-hoc use.

    ``multiLine`` is on because the reference corpus carries quoted
    newlines inside address fields (generate_raw_data.py uses Faker
    multiline addresses) and pandas' parser accepts them. Trade-off: a
    multiLine CSV file is not line-splittable, so at scale ingest
    parallelism comes from file count, not intra-file splits — bronze
    should receive many moderate files, not one giant CSV."""
    reader = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan (reference: load_silver.py:28-38, load_gold.py:27-35)."""
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Overwrite-whole-table Parquet sink (reference: load_bronze.py:55-62,
    load_silver.py:41-51, load_gold.py:37-47)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines scan (additive beyond the reference's CSV/Parquet).
    Schema should be declared — JSON inference is a full extra scan."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_csv(df: DataFrame, path: str) -> None:
    """Header CSV sink (reference: generate_raw_data.py:144-149)."""
    df.write.mode("overwrite").option("header", True).csv(path)
