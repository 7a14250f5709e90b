"""Sources & sinks: schema-declared CSV/Parquet scans and overwrite sinks,
plus the seeded dirty-fixture generator used by the test suite."""

from datawarehouse_vehicule_insurance_spark.sources.io import (
    read_csv,
    read_parquet,
    write_csv,
    write_parquet,
)

__all__ = ["read_csv", "read_parquet", "write_csv", "write_parquet"]
