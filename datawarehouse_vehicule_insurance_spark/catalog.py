"""Schema registry and zone-aware catalog.

The reference declares no schemas anywhere — ``pd.read_csv`` infers dtypes at
bronze (reference: scripts/bronze/load_bronze.py:35) and Parquet round-trips
them. At 100 TB, CSV inference is a full extra scan, so the engine declares an
explicit ``StructType`` per table once, here (SURVEY.md §1.5).

Zones mirror the reference's medallion layout (reference: README.md:26-37):
``bronze/`` raw re-encoded parquet, ``silver/`` cleaned, ``gold/`` dimensional.
Table identity is ``zone/name``; the catalog resolves it to a path under a
configurable root (local dir or ``s3a://bucket``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Insurance source schemas (reference: scripts/data_sources/generate_raw_data.py)
# ---------------------------------------------------------------------------

_S = T.StringType()
_D = T.DoubleType()


def _struct(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


#: Raw (bronze-grain) schemas. All ids are 8-hex-char strings
#: (reference: generate_raw_data.py:29). Money is double, not decimal —
#: the reference generates ``round(random.uniform(...), 2)`` floats
#: (reference: generate_raw_data.py:94,108,119); DecimalType(12,2) is the
#: engine's opt-in exact-money mode.
RAW_SCHEMAS: dict[str, T.StructType] = {
    "clients": _struct(
        ("client_id", _S), ("name", _S), ("email", _S), ("phone", _S),
        ("address", _S),
    ),
    "crm_clients": _struct(
        ("client_id", _S), ("name", _S), ("email", _S), ("phone", _S),
        ("address", _S), ("iban_account_number", _S), ("company_name", _S),
        ("client_type", _S), ("risk_level", _S),
        ("marketing_opt_in", T.BooleanType()),
    ),
    "vehicles": _struct(
        ("vehicle_id", _S), ("client_id", _S), ("brand", _S), ("model", _S),
        ("year", T.IntegerType()), ("plate", _S),
    ),
    "policies": _struct(
        ("policy_id", _S), ("client_id", _S), ("vehicle_id", _S),
        ("coverage", _S), ("status", _S), ("premium", _D),
    ),
    "claims": _struct(
        ("claim_id", _S), ("policy_id", _S), ("claim_date", _S),
        ("claim_type", _S), ("amount", _D),
    ),
    "payments": _struct(
        ("payment_id", _S), ("policy_id", _S), ("amount", _D),
        ("payment_date", _S),
    ),
}

#: bronze object names, mirroring the reference's source→bronze key map
#: (reference: load_bronze.py:78-85), e.g. clients.csv → erp_clients.parquet.
BRONZE_NAMES: dict[str, str] = {
    "clients": "erp_clients",
    "crm_clients": "crm_clients",
    "vehicles": "erp_vehicles",
    "policies": "erp_policies",
    "claims": "erp_claims",
    "payments": "erp_payments",
}

#: Categorical domains validated in silver — the silver comparison is against
#: TITLE-CASED versions of the raw enums (reference: load_silver.py:155,161,191
#: vs generate_raw_data.py:84-85,100).
DOMAINS: dict[str, list[str]] = {
    "coverage": ["Básica", "Intermedia", "Premium"],
    "status": ["Activa", "Vencida", "Cancelada"],
    "claim_type": ["Colisión", "Robo", "Daños Por Clima", "Incendio", "Otros"],
    "client_type": ["Gold", "Silver", "Bronze"],
    "risk_level": ["Low", "Medium", "High"],
}


@dataclass
class Catalog:
    """Resolves ``zone/table`` to a storage path and applies schemas.

    ``root`` may be a local directory (tests) or ``s3a://bucket`` (prod);
    the reference's boto3 whole-object get/put becomes s3a split reads and
    distributed writes for free.
    """

    root: str
    zones: tuple[str, ...] = ("bronze", "silver", "gold")
    formats: dict[str, str] = field(default_factory=dict)

    def path(self, zone: str, name: str) -> str:
        return f"{self.root.rstrip('/')}/{zone}/{name}.parquet"

    def schema(self, table: str) -> T.StructType:
        return RAW_SCHEMAS[table]
