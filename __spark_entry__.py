"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship client-summary query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full parity suite from
``datawarehouse_vehicule_insurance_spark.queries`` (one entry per implemented
operator family from SURVEY.md §2 plus the additive large-scale-pipeline
operators).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from datawarehouse_vehicule_insurance_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q_client_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (keys match ``queries()``)."""
    return dict(Q.ORACLES)
