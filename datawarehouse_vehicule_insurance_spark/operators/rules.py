"""Declarative cleaning-rule engine — the heart of the silver layer.

The reference cleans each table with an imperative pipeline of per-element
``Series.apply`` lambdas (reference: scripts/silver/load_silver.py:55-221).
Here each cleaning step is a declarative :class:`Rule`; :func:`apply_rules`
compiles a rule list into native Column expressions folded into ONE
``select`` plus the row-dropping filters — Catalyst fuses the whole thing
into a single whole-stage-codegen'd projection over the scan, so a 100-TB
silver build is one pass over the data with predicate pushdown intact.

Rule vocabulary ↔ reference semantics (SURVEY.md §2.2/§2.4):

- ``NotNullKeys``     — drop rows with NULL key(s) (load_silver.py:59,119,152,178,208)
- ``TextNormalize``   — trim + title + empty→NULL (load_silver.py:63-79)
- ``UpperNormalize``  — trim + UPPER + empty→NULL (load_silver.py:82-85)
- ``RegexValidate``   — keep iff full-match else NULL (load_silver.py:88-96)
- ``RegexStrip``      — strip chars outside a keep-class (load_silver.py:99-107,137-143)
- ``DomainValidate``  — keep iff in enum domain else NULL (load_silver.py:155-164,191-194)
- ``IntRange``        — keep iff in [lo, hi] cast int else NULL (load_silver.py:131-134)
- ``PositiveRound2``  — keep iff > 0, round 2dp; else NULL or DROP (load_silver.py:167-169,197-199,215-218)
- ``DateNotFuture``   — parse, NULL/DROP on unparseable-or-future (load_silver.py:181-188)
- ``DateParse``       — parse, NULL/DROP on unparseable (load_silver.py:211-212)

The key asymmetry preserved from the reference: bad *attribute* values are
nulled with the row retained; bad *keys* (and bad payment dates/amounts)
drop the row.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datawarehouse_vehicule_insurance_spark.functions import text as TX
from datawarehouse_vehicule_insurance_spark.functions import validate as V


class Rule:
    """Base class. Subclasses implement either ``exprs`` (column rewrites)
    or ``predicate`` (row filter), or both."""

    def exprs(self, ctx: RuleContext) -> dict[str, Column]:
        return {}

    def predicate(self, ctx: RuleContext) -> Column | None:
        return None


@dataclass
class RuleContext:
    """Injectable execution context — pins ``now()`` for the time-dependent
    rules (V4/V7 in SURVEY.md §2.2) so tests and the DuckDB oracle agree."""

    ref_date: dt.date | None = None
    fidelity: str = "fast"  # 'fast' = initcap; 'exact' = Python str.title()


@dataclass
class NotNullKeys(Rule):
    cols: list[str]

    def predicate(self, ctx: RuleContext) -> Column:
        pred = F.lit(True)
        for c in self.cols:
            pred = pred & F.col(c).isNotNull()
        return pred


@dataclass
class TextNormalize(Rule):
    """``keep_empty=True`` reproduces the reference's vehicles
    brand/model fidelity exactly (load_silver.py:123-128 keeps ``''``
    after title-casing); the default nulls empty-after-trim values —
    the documented accepted deviation (NOTES.md)."""

    cols: list[str]
    keep_empty: bool = False

    def exprs(self, ctx: RuleContext) -> dict[str, Column]:
        return {
            c: TX.normalize_text(
                F.col(c), fidelity=ctx.fidelity, keep_empty=self.keep_empty
            )
            for c in self.cols
        }


@dataclass
class UpperNormalize(Rule):
    cols: list[str]

    def exprs(self, ctx: RuleContext) -> dict[str, Column]:
        return {c: TX.upper_clean(F.col(c)) for c in self.cols}


@dataclass
class RegexValidate(Rule):
    col: str
    pattern: str

    def exprs(self, ctx: RuleContext) -> dict[str, Column]:
        return {self.col: TX.regex_validate(F.col(self.col), self.pattern)}


@dataclass
class RegexStrip(Rule):
    """Remove every char not matching ``keep_class``; empty result → NULL.
    ``upper_first=True`` reproduces plate canonicalization."""

    col: str
    keep_class: str = r"[^\d+\-]"
    upper_first: bool = False

    def exprs(self, ctx: RuleContext) -> dict[str, Column]:
        c = F.col(self.col)
        if self.upper_first:
            return {self.col: TX.clean_plate(c)}
        return {self.col: TX.clean_phone(c)}


@dataclass
class DomainValidate(Rule):
    col: str
    domain: list[str]
    normalize: bool = True  # title-normalize before comparing, like silver

    def exprs(self, ctx: RuleContext) -> dict[str, Column]:
        normalizer = (
            (lambda c: TX.normalize_text(c, fidelity=ctx.fidelity))
            if self.normalize
            else None
        )
        return {
            self.col: V.domain_validate(F.col(self.col), self.domain, normalizer)
        }


@dataclass
class IntRange(Rule):
    col: str
    lo: int
    hi: int | None = None  # None → "current year" pinned to ctx.ref_date

    def exprs(self, ctx: RuleContext) -> dict[str, Column]:
        return {
            self.col: V.int_range_validate(
                F.col(self.col), self.lo, self.hi, ctx.ref_date
            )
        }


@dataclass
class PositiveRound2(Rule):
    """``banker=True`` uses HALF_EVEN (``F.bround``) for exact CPython
    ``round()`` fidelity; the default HALF_UP matches SQL conventions —
    they differ only on .xx5 boundaries of >2-decimal raw values
    (documented accepted deviation, NOTES.md)."""

    col: str
    on_invalid: str = "null"  # 'null' (policies/claims) | 'drop' (payments)
    banker: bool = False

    def exprs(self, ctx: RuleContext) -> dict[str, Column]:
        return {
            self.col: V.positive_round2(F.col(self.col), banker=self.banker)
        }

    def predicate(self, ctx: RuleContext) -> Column | None:
        if self.on_invalid == "drop":
            # applied AFTER the rewrite: drop rows whose amount nulled out
            return F.col(self.col).isNotNull()
        return None


@dataclass
class DateNotFuture(Rule):
    col: str
    on_invalid: str = "null"

    def exprs(self, ctx: RuleContext) -> dict[str, Column]:
        return {self.col: V.date_not_future(F.col(self.col), ctx.ref_date)}

    def predicate(self, ctx: RuleContext) -> Column | None:
        if self.on_invalid == "drop":
            return F.col(self.col).isNotNull()
        return None


@dataclass
class DateParse(Rule):
    col: str
    on_invalid: str = "drop"  # payments drop unparseable dates (F6)

    def exprs(self, ctx: RuleContext) -> dict[str, Column]:
        return {self.col: V.parse_date(F.col(self.col))}

    def predicate(self, ctx: RuleContext) -> Column | None:
        if self.on_invalid == "drop":
            return F.col(self.col).isNotNull()
        return None


def apply_rules(
    df: DataFrame, rules: list[Rule], ctx: RuleContext | None = None
) -> DataFrame:
    """Compile the rule list against ``df``.

    Order semantics match the reference's imperative pipelines: each rule
    sees the columns as rewritten by the rules before it (e.g. email regex
    validation runs over the already-title-cased email,
    reference: load_silver.py:66-96). Key-drop filters apply at their
    position in the list; value-drop filters (``on_invalid='drop'``) apply
    after their rewrite. Catalyst collapses the chained projections into a
    single stage, so declaring rules one-by-one costs nothing at runtime.
    """
    ctx = ctx or RuleContext()
    for rule in rules:
        exprs = rule.exprs(ctx)
        if exprs:
            df = df.withColumns(exprs)
        pred = rule.predicate(ctx)
        if pred is not None:
            df = df.filter(pred)
    return df


# ---------------------------------------------------------------------------
# The five silver pipelines as declarative rule lists
# (reference: load_silver.py:55-221; SURVEY.md §3.2)
# ---------------------------------------------------------------------------

TEXT_COLUMNS = [
    "name", "email", "phone", "address", "company_name", "client_type",
    "risk_level",
]  # reference: load_silver.py:63 — note emails/phones ARE title-cased first


def clients_rules() -> list[Rule]:
    """reference: load_silver.py:55-113 (clients half)."""
    cols = ["name", "email", "phone", "address"]
    return [
        TextNormalize(cols),
        RegexValidate("email", TX.EMAIL_PATTERN),
        RegexStrip("phone"),
    ]


def crm_clients_rules() -> list[Rule]:
    """reference: load_silver.py:55-113 (crm half) — drops NULL client_id
    keys first (:59), then the same text pipeline plus IBAN upper."""
    cols = [
        "name", "email", "phone", "address", "company_name", "client_type",
        "risk_level",
    ]
    return [
        NotNullKeys(["client_id"]),
        TextNormalize(cols),
        UpperNormalize(["iban_account_number"]),
        RegexValidate("email", TX.EMAIL_PATTERN),
        RegexStrip("phone"),
    ]


def vehicles_rules() -> list[Rule]:
    """reference: load_silver.py:115-146."""
    return [
        NotNullKeys(["client_id"]),
        TextNormalize(["brand", "model"]),
        IntRange("year", 1900, hi=None),
        RegexStrip("plate", upper_first=True),
    ]


def policies_rules() -> list[Rule]:
    """reference: load_silver.py:148-172."""
    from datawarehouse_vehicule_insurance_spark.catalog import DOMAINS

    return [
        NotNullKeys(["client_id", "vehicle_id"]),
        DomainValidate("coverage", DOMAINS["coverage"]),
        DomainValidate("status", DOMAINS["status"]),
        PositiveRound2("premium", on_invalid="null"),
    ]


def claims_rules() -> list[Rule]:
    """reference: load_silver.py:174-202."""
    from datawarehouse_vehicule_insurance_spark.catalog import DOMAINS

    return [
        NotNullKeys(["policy_id"]),
        DateNotFuture("claim_date", on_invalid="null"),
        DomainValidate("claim_type", DOMAINS["claim_type"]),
        PositiveRound2("amount", on_invalid="null"),
    ]


def payments_rules() -> list[Rule]:
    """reference: load_silver.py:204-221 — note payments DROP invalid rows
    (dates F6, amounts F7) where other tables null-and-retain."""
    return [
        NotNullKeys(["policy_id"]),
        DateParse("payment_date", on_invalid="drop"),
        PositiveRound2("amount", on_invalid="drop"),
    ]


SILVER_RULES: dict[str, callable] = {
    "clients": clients_rules,
    "crm_clients": crm_clients_rules,
    "vehicles": vehicles_rules,
    "policies": policies_rules,
    "claims": claims_rules,
    "payments": payments_rules,
}
