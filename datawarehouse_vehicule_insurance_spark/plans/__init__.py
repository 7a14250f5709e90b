"""Pipeline plans: the bronze → silver → gold medallion runner."""

from datawarehouse_vehicule_insurance_spark.plans.pipeline import (
    Pipeline,
    run_bronze,
    run_gold,
    run_silver,
)

__all__ = ["Pipeline", "run_bronze", "run_silver", "run_gold"]
