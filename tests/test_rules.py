"""Silver cleaning-rule engine tests — each reference fault class
(FIXTURES.md checklist) exercised against the rule vocabulary, with
reference semantics checked value-by-value against plain Python."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datawarehouse_vehicule_insurance_spark.operators import rules as R

REF_DATE = dt.date(2025, 3, 28)  # pinned reference snapshot date
CTX = R.RuleContext(ref_date=REF_DATE)
CTX_EXACT = R.RuleContext(ref_date=REF_DATE, fidelity="exact")


def rows(df):
    return [r.asDict() for r in df.collect()]


def test_empty_to_null_and_title(spark):
    df = spark.createDataFrame(
        [("  ana garcía ",), ("",), ("   ",), (None,), ("JOSÉ LÓPEZ",)],
        "name string",
    )
    out = R.apply_rules(df, [R.TextNormalize(["name"])], CTX)
    assert [r["name"] for r in out.collect()] == [
        "Ana García", None, None, None, "José López",
    ]


def test_title_exact_matches_python_str_title(spark):
    # tokens where initcap and str.title() diverge: hyphen, apostrophe, @
    vals = ["o'neil", "smith-jones", "kristen@example.com", "f-150",
            "daños por clima", "MIXED case-STRING"]
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    out = R.apply_rules(df, [R.TextNormalize(["t"])], CTX_EXACT)
    got = [r["t"] for r in out.orderBy("t").collect()]
    expect = sorted(v.strip().title() for v in vals)
    assert got == expect


def test_email_regex_validation_after_titlecase(spark):
    # silver title-cases the email BEFORE regex validation
    # (reference: load_silver.py:63-96) — 'Kristen@Example.Com' still passes.
    df = spark.createDataFrame(
        [("kristen@example.com",), ("no-at-sign",), ("a@nodot",),
         ("x@y.co",), (None,)],
        "email string",
    )
    out = R.apply_rules(
        df,
        [R.TextNormalize(["email"]),
         R.RegexValidate("email", R.TX.EMAIL_PATTERN)],
        CTX_EXACT,
    )
    got = [r["email"] for r in out.collect()]
    assert got == ["Kristen@Example.Com", None, None, "X@Y.Co", None]


def test_phone_strip(spark):
    df = spark.createDataFrame(
        [("(555) 123-4567",), ("+34 600.111.222 x9",), ("abc",), ("",)],
        "phone string",
    )
    out = R.apply_rules(df, [R.RegexStrip("phone")], CTX)
    assert [r["phone"] for r in out.collect()] == [
        "555123-4567", "+34600111222​9".replace("​", ""), None, None,
    ]


def test_plate_canonicalization(spark):
    df = spark.createDataFrame(
        [("ab-123 cd",), ("XYZ 99.9",)], "plate string"
    )
    out = R.apply_rules(df, [R.RegexStrip("plate", upper_first=True)], CTX)
    assert [r["plate"] for r in out.collect()] == ["AB123CD", "XYZ999"]


def test_domain_validation_nulls_but_keeps_row(spark):
    df = spark.createDataFrame(
        [("Daños por clima",), ("robo",), ("Meteorito",), (None,)],
        "claim_type string",
    )
    out = R.apply_rules(
        df,
        [R.DomainValidate("claim_type",
                          ["Colisión", "Robo", "Daños Por Clima",
                           "Incendio", "Otros"])],
        CTX,
    )
    got = [r["claim_type"] for r in out.collect()]
    # raw lowercase variants title-normalize INTO the domain; junk → NULL
    assert got == ["Daños Por Clima", "Robo", None, None]
    assert out.count() == 4  # rows retained


def test_year_range_with_pinned_clock(spark):
    df = spark.createDataFrame(
        [(1850,), (1900,), (2024,), (2025,), (2050,), (None,)], "year int"
    )
    out = R.apply_rules(df, [R.IntRange("year", 1900)], CTX)
    assert [r["year"] for r in out.collect()] == [
        None, 1900, 2024, 2025, None, None,
    ]


def test_positive_round2_null_vs_drop(spark):
    # NOTE: exact .005 boundaries diverge between Python round (banker's on
    # the binary value) and Spark round (HALF_UP on the decimal repr) —
    # SURVEY.md §7.3 #5. Inputs in the reference are pre-rounded to 2dp, so
    # only non-boundary values are contract-tested here.
    df = spark.createDataFrame(
        [(100.004,), (0.0,), (-5.0,), (None,)], "amount double"
    )
    nulled = R.apply_rules(df, [R.PositiveRound2("amount")], CTX)
    assert nulled.count() == 4
    assert [r["amount"] for r in nulled.collect()] == [100.0, None, None, None]

    dropped = R.apply_rules(
        df, [R.PositiveRound2("amount", on_invalid="drop")], CTX
    )
    assert [r["amount"] for r in dropped.collect()] == [100.0]


def test_future_dates_nulled_with_pinned_clock(spark):
    df = spark.createDataFrame(
        [("2023-02-02",), ("2030-01-01",), ("not a date",), ("2025-03-28",)],
        "claim_date string",
    )
    out = R.apply_rules(df, [R.DateNotFuture("claim_date")], CTX)
    got = [r["claim_date"] for r in out.collect()]
    assert got == [dt.date(2023, 2, 2), None, None, dt.date(2025, 3, 28)]


def test_not_null_keys_drops_rows(spark):
    df = spark.createDataFrame(
        [Row(policy_id="p1", client_id="c1", vehicle_id="v1"),
         Row(policy_id="p2", client_id=None, vehicle_id="v1"),
         Row(policy_id="p3", client_id="c1", vehicle_id=None)],
    )
    out = R.apply_rules(
        df, [R.NotNullKeys(["client_id", "vehicle_id"])], CTX
    )
    assert [r["policy_id"] for r in out.collect()] == ["p1"]


def test_iban_upper(spark):
    df = spark.createDataFrame([(" es12abc ",), ("",)], "iban_account_number string")
    out = R.apply_rules(df, [R.UpperNormalize(["iban_account_number"])], CTX)
    assert [r["iban_account_number"] for r in out.collect()] == ["ES12ABC", None]


def test_silver_rules_plan_is_single_stage(spark):
    """The whole clients rule list must fuse into one projection —
    no shuffle, no extra exchange in the plan."""
    df = spark.createDataFrame(
        [("c1", "ana", "a@b.co", "123", "x")],
        "client_id string, name string, email string, phone string, address string",
    )
    out = R.apply_rules(df, R.clients_rules(), CTX)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_keep_empty_matches_reference_vehicles_path(spark):
    """keep_empty=True reproduces load_silver.py:123-128 exactly: ''
    after trim stays '' (the default nulls it — documented deviation)."""
    from datawarehouse_vehicule_insurance_spark.functions.text import (
        normalize_text,
    )

    df = spark.createDataFrame(
        [("  ",), ("",), (" ford focus ",), (None,)], "brand string"
    )
    kept = [
        r["b"] for r in df.select(
            normalize_text(F.col("brand"), keep_empty=True).alias("b")
        ).collect()
    ]
    assert kept == ["", "", "Ford Focus", None]
    nulled = [
        r["b"] for r in df.select(
            normalize_text(F.col("brand")).alias("b")
        ).collect()
    ]
    assert nulled == [None, None, "Ford Focus", None]


def test_banker_rounding_matches_cpython_round(spark):
    """positive_round2(banker=True) == Python round() (HALF_EVEN on the
    binary double), including the .xx5 boundary where HALF_UP differs."""
    from datawarehouse_vehicule_insurance_spark.functions.validate import (
        positive_round2,
    )

    vals = [2.675, 2.665, 0.125, 0.135, 1.005, 10.555, 3.0, -1.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r["r"] for r in df.select(
            positive_round2(F.col("x"), banker=True).alias("r")
        ).collect()
    ]
    want = [round(v, 2) if v > 0 else None for v in vals]
    assert got == want
