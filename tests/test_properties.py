"""Property-based tests: the cleaning rules must agree with a plain-
Python reference implementation of the reference's lambdas
(reference: load_silver.py:63-143) on arbitrary input, not just the
fixture corpus. Each Hypothesis example is a BATCH of strings evaluated
in one Spark job to keep runtime sane."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datawarehouse_vehicule_insurance_spark.functions import text as TX

TEXTISH = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N", "P", "Z"), max_codepoint=0x2FF
    ),
    max_size=40,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_title_norm(x: str | None) -> str | None:
    """reference: load_silver.py:69-71 — strip, title, ''→None."""
    if x is None:
        return None
    s = x.strip()
    return s.title() if s else None


def _py_phone(x: str | None) -> str | None:
    """reference: load_silver.py:99-107."""
    if x is None:
        return None
    s = re.sub(r"[^\d+\-]", "", x)
    return s if s else None


def _py_plate(x: str | None) -> str | None:
    """reference: load_silver.py:137-143 (ASCII [A-Z0-9] keep-class)."""
    if x is None:
        return None
    return re.sub(r"[^A-Z0-9]", "", x.upper())


@given(st.lists(st.one_of(st.none(), TEXTISH), min_size=1, max_size=30))
@SETTINGS
def test_exact_title_matches_python(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    df2 = df.select(TX.normalize_text(F.col("t"), "exact").alias("out"))
    got = [r["out"] for r in df2.collect()]
    want = [_py_title_norm(v) for v in vals]
    assert got == want, (got, want)


@given(st.lists(st.one_of(st.none(), TEXTISH), min_size=1, max_size=30))
@SETTINGS
def test_phone_strip_matches_python(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = [
        r["out"] for r in df.select(TX.clean_phone(F.col("t")).alias("out")).collect()
    ]
    want = [_py_phone(v) for v in vals]
    assert got == want


@given(st.lists(st.one_of(st.none(), TEXTISH), min_size=1, max_size=30))
@SETTINGS
def test_plate_canon_matches_python(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = [
        r["out"] for r in df.select(TX.clean_plate(F.col("t")).alias("out")).collect()
    ]
    want = [_py_plate(v) for v in vals]
    assert got == want


@given(st.lists(st.one_of(st.none(), TEXTISH), min_size=1, max_size=30))
@SETTINGS
def test_empty_to_null_idempotent(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    once = df.select(TX.empty_to_null(F.col("t")).alias("out"))
    twice = once.select(TX.empty_to_null(F.col("out")).alias("out"))
    assert [r["out"] for r in once.collect()] == [
        r["out"] for r in twice.collect()
    ]
