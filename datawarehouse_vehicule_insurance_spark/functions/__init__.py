"""Scalar column functions — the engine's analogue of the reference's
per-element ``Series.apply`` lambdas, re-expressed as native (codegen'd)
Column expressions wherever possible; pandas UDFs only for the one semantic
Spark cannot express natively (exact Python ``str.title()``)."""

from datawarehouse_vehicule_insurance_spark.functions.text import (
    clean_phone,
    clean_plate,
    empty_to_null,
    normalize_text,
    regex_validate,
    title_exact,
    upper_clean,
)
from datawarehouse_vehicule_insurance_spark.functions.validate import (
    date_not_future,
    domain_validate,
    int_range_validate,
    positive_round2,
)

__all__ = [
    "clean_phone",
    "clean_plate",
    "empty_to_null",
    "normalize_text",
    "regex_validate",
    "title_exact",
    "upper_clean",
    "date_not_future",
    "domain_validate",
    "int_range_validate",
    "positive_round2",
]
