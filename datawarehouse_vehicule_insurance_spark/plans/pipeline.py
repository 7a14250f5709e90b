"""Medallion pipeline runner (SURVEY.md §3).

The reference runs three imperative scripts (bronze → silver → gold) with a
per-table try/except continue-on-error loop
(reference: scripts/bronze/load_bronze.py:88-101). Here each layer is a
function over a :class:`~..catalog.Catalog`; the runner isolates failures
per table, logs row counters with ``observe()`` (no extra ``count()``
actions — the reference re-scans for every log counter,
load_silver.py:110-111,145,171,201,220), and takes an injectable
``ref_date`` so the time-dependent rules are deterministic.
"""

from __future__ import annotations

import datetime as dt
import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

from datawarehouse_vehicule_insurance_spark.catalog import (
    BRONZE_NAMES,
    RAW_SCHEMAS,
    Catalog,
)
from datawarehouse_vehicule_insurance_spark.operators import gold as G
from datawarehouse_vehicule_insurance_spark.operators import rules as R
from datawarehouse_vehicule_insurance_spark.sources import io as IO

logger = logging.getLogger("datawarehouse_vehicule_insurance_spark.pipeline")


@dataclass
class Pipeline:
    """One medallion pipeline over a catalog root."""

    spark: SparkSession
    catalog: Catalog
    ref_date: dt.date | None = None
    fidelity: str = "fast"
    #: per-table outcomes of the last run: name -> "ok" | error string
    results: dict[str, str] = field(default_factory=dict)

    def _isolate(self, name: str, fn) -> None:
        """Per-table continue-on-error (reference: load_bronze.py:98-101)."""
        try:
            fn()
            self.results[name] = "ok"
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            logger.error("table %s failed: %s", name, exc)
            self.results[name] = f"error: {exc}"

    # -- bronze ------------------------------------------------------------
    def run_bronze(self, csv_root: str) -> dict[str, str]:
        """CSV → bronze parquet for the six source tables
        (reference: load_bronze.py:73-107)."""
        for table, bronze_name in BRONZE_NAMES.items():
            def _load(table=table, bronze_name=bronze_name):
                df = IO.read_csv(
                    self.spark, f"{csv_root}/{table}.csv", RAW_SCHEMAS[table]
                )
                IO.write_parquet(df, self.catalog.path("bronze", bronze_name))
            self._isolate(f"bronze/{bronze_name}", _load)
        return self.results

    # -- silver ------------------------------------------------------------
    def run_silver(self) -> dict[str, str]:
        """Apply the declarative cleaning rules per table
        (reference: load_silver.py:225-257). Each table is one scan → one
        fused projection+filter stage → one write."""
        ctx = R.RuleContext(ref_date=self.ref_date, fidelity=self.fidelity)
        for table, rules_fn in R.SILVER_RULES.items():
            def _clean(table=table, rules_fn=rules_fn):
                bronze_name = BRONZE_NAMES[table]
                df = IO.read_parquet(
                    self.spark, self.catalog.path("bronze", bronze_name)
                )
                obs = Observation(f"silver_{table}")
                cleaned = R.apply_rules(df, rules_fn(), ctx).observe(
                    obs, F.count(F.lit(1)).alias("rows")
                )
                IO.write_parquet(
                    cleaned, self.catalog.path("silver", bronze_name)
                )
                logger.info("silver/%s rows=%s", table, obs.get["rows"])
            self._isolate(f"silver/{table}", _clean)
        return self.results

    # -- gold ----------------------------------------------------------------
    def run_gold(self) -> dict[str, str]:
        """Build the dimensional layer (reference: load_gold.py:142-154),
        plus the README-promised-but-missing ``fact_payments``."""
        read = lambda name: IO.read_parquet(  # noqa: E731
            self.spark, self.catalog.path("silver", name)
        )

        def _dim_clients():
            df = G.build_dim_clients(read("erp_clients"), read("crm_clients"))
            IO.write_parquet(df, self.catalog.path("gold", "dim_clients"))

        def _dim_vehicles():
            df = G.build_dim_vehicles(read("erp_vehicles"))
            IO.write_parquet(df, self.catalog.path("gold", "dim_vehicles"))

        def _fact_summary():
            df = G.build_fact_client_summary(
                read("erp_clients"), read("erp_policies"),
                read("erp_payments"), read("erp_claims"),
            )
            IO.write_parquet(
                df, self.catalog.path("gold", "fact_client_summary")
            )

        def _fact_payments():
            df = G.build_fact_payments(read("erp_payments"), read("erp_policies"))
            IO.write_parquet(df, self.catalog.path("gold", "fact_payments"))

        self._isolate("gold/dim_clients", _dim_clients)
        self._isolate("gold/dim_vehicles", _dim_vehicles)
        self._isolate("gold/fact_client_summary", _fact_summary)
        self._isolate("gold/fact_payments", _fact_payments)
        return self.results


def run_bronze(spark, catalog, csv_root, **kw) -> dict[str, str]:
    return Pipeline(spark, catalog, **kw).run_bronze(csv_root)


def run_silver(spark, catalog, **kw) -> dict[str, str]:
    return Pipeline(spark, catalog, **kw).run_silver()


def run_gold(spark, catalog, **kw) -> dict[str, str]:
    return Pipeline(spark, catalog, **kw).run_gold()
