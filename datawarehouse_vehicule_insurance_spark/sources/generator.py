"""Seeded dirty-fixture generator (SURVEY.md §2.1 S6, §5 item 3).

Reproduces every fault class the reference's generator plants
(reference: scripts/data_sources/generate_raw_data.py:24-122), but
deterministically (the reference never seeds Faker/random — FIXTURES.md
calls that out as something to improve). No Faker dependency: names,
emails, phones, addresses, plates come from seeded ``random`` so two runs
produce byte-identical tables.

Fault classes planted (FIXTURES.md checklist):
  1. NULL FKs        — vehicles/policies 5%, claims/payments 10%
  2. empty-as-missing — phones/addresses/IBAN/company
  3. case noise      — 30% UPPER CRM names; mixed-case emails; dirty plates
  4. invalid emails  — 5% malformed shapes
  5. phone punctuation noise — Faker-style ``(). x+`` chars
  6. out-of-domain categoricals — raw ``"Daños por clima"`` (lowercase 'p')
  7. future claim dates — planted ``"2030-01-01"`` (5%)
  8. non-positive amounts — payments uniform(-100, 3000); 5% premium ≤ 0
  9. orphan FKs      — claim/payment policy_ids not in policies
 10. CRM covers only ~70% of clients
 11. out-of-range years — 2% year 1850 / 2050

This is a test fixture, not an engine operator — generation is driver-side
(tens of thousands of rows max) and handed to Spark via
``spark.createDataFrame`` with the declared catalog schema.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from datawarehouse_vehicule_insurance_spark.catalog import RAW_SCHEMAS

_FIRST = ["Ana", "Luis", "María", "José", "Carmen", "Juan", "Lucía", "Pedro",
          "Kristen", "Sofía", "Miguel", "Elena", "O'Neil", "Jean-Luc"]
_LAST = ["García", "Martínez", "López", "Sánchez", "Pérez", "Gómez",
         "Campbell", "Smith-Jones", "Fernández", "Díaz"]
_STREETS = ["Calle Mayor", "Av. Libertad", "Gran Vía", "Paseo del Prado"]
_BRANDS = ["Toyota", "Honda", "Ford", "Chevrolet", "Nissan"]
_MODELS = ["Corolla", "Civic", "F-150", "Cruze", "Sentra"]
_COVERAGE = ["Básica", "Intermedia", "Premium"]
_STATUS = ["Activa", "Vencida", "Cancelada"]
_CLAIM_TYPES = ["Colisión", "Robo", "Daños por clima", "Incendio", "Otros"]
_CLIENT_TYPES = ["gold", "silver", "bronze"]
_RISK = ["low", "medium", "high"]


def _hex_id(rng: random.Random) -> str:
    return "".join(rng.choice("0123456789abcdef") for _ in range(8))


def _name(rng: random.Random) -> str:
    return f"{rng.choice(_FIRST)} {rng.choice(_LAST)}"


def _email(rng: random.Random, name: str) -> str:
    user = name.split()[0].lower()
    dom = rng.choice(["example.com", "mail.es", "corp.org"])
    e = f"{user}{rng.randint(1, 999)}@{dom}"
    if rng.random() < 0.3:  # mixed case noise
        e = e.capitalize()
    if rng.random() < 0.05:  # malformed shapes (fault 4)
        e = rng.choice([e.replace("@", ""), f"{user}@nodot", f"@{dom}", e + " "])
    return e


def _phone(rng: random.Random) -> str:
    base = f"{rng.randint(100, 999)}-{rng.randint(100, 999)}-{rng.randint(1000, 9999)}"
    return rng.choice([base, f"({base[:3]}) {base[4:]}", f"+34 {base}",
                       f"{base} x{rng.randint(1, 99)}", f"001.{base}"])


def _address(rng: random.Random) -> str:
    return f"{rng.randint(1, 999)} {rng.choice(_STREETS)}\nPiso {rng.randint(1, 9)}"


def _date(rng: random.Random) -> str:
    return (f"{rng.randint(2020, 2025)}-{rng.randint(1, 12):02d}"
            f"-{rng.randint(1, 28):02d}")


def generate_raw_tables(
    spark: SparkSession,
    n_clients: int = 500,
    seed: int = 42,
) -> dict[str, DataFrame]:
    """Generate the six dirty source tables at ``n_clients`` scale
    (reference sizes: 5000 clients / ~3500 crm / 5000 vehicles / 5000
    policies / 2500 claims / 5000 payments — generate_raw_data.py:128-140;
    row ratios preserved here)."""
    rng = random.Random(seed)

    clients = []
    for _ in range(n_clients):
        name = _name(rng)
        clients.append((
            _hex_id(rng),
            name,
            None if rng.random() < 0.10 else _email(rng, name),  # 10% NULL
            "" if rng.random() < 0.10 else _phone(rng),          # 10% empty
            _address(rng),
        ))
    client_ids = [c[0] for c in clients]

    crm = []
    for cid in rng.sample(client_ids, int(n_clients * 0.7)):  # 70% coverage
        name = _name(rng)
        if rng.random() < 0.30:
            name = name.upper()  # fault 3
        crm.append((
            cid,
            name,
            None if rng.random() < 0.20 else _email(rng, name),
            "" if rng.random() < 0.20 else _phone(rng),
            "" if rng.random() < 0.30 else _address(rng),
            "" if rng.random() < 0.70 else f"ES{rng.randint(10**20, 10**21 - 1)}",
            "" if rng.random() < 0.70 else f"{rng.choice(_LAST)} S.A.",
            rng.choice(_CLIENT_TYPES),
            rng.choice(_RISK),
            rng.random() < 0.5,
        ))

    vehicles = []
    for _ in range(n_clients):
        year = rng.randint(1995, 2024)
        if rng.random() < 0.02:
            year = rng.choice([1850, 2050])  # fault 11
        plate = f"{rng.choice('abcDEF')}{rng.randint(100, 999)} {rng.choice('xyZ')}{rng.choice('- .')}{rng.randint(10, 99)}"
        vehicles.append((
            _hex_id(rng),
            None if rng.random() < 0.05 else rng.choice(client_ids),
            rng.choice(_BRANDS), rng.choice(_MODELS), year, plate,
        ))
    vehicle_ids = [v[0] for v in vehicles]

    policies = []
    for _ in range(n_clients):
        premium = round(rng.uniform(200, 3000), 2)
        if rng.random() < 0.05:
            premium = rng.choice([0.0, -50.0])  # fault 8 (premium side)
        policies.append((
            _hex_id(rng),
            None if rng.random() < 0.05 else rng.choice(client_ids),
            None if rng.random() < 0.05 else rng.choice(vehicle_ids),
            rng.choice(_COVERAGE), rng.choice(_STATUS), premium,
        ))
    policy_ids = [p[0] for p in policies]

    claims = []
    for _ in range(n_clients // 2):
        pid = None if rng.random() < 0.10 else rng.choice(policy_ids)
        if pid is not None and rng.random() < 0.05:
            pid = _hex_id(rng)  # orphan FK (fault 9)
        claims.append((
            _hex_id(rng),
            pid,
            "2030-01-01" if rng.random() < 0.05 else _date(rng),  # fault 7
            rng.choice(_CLAIM_TYPES),
            round(rng.uniform(100, 20000), 2),
        ))

    payments = []
    for _ in range(n_clients):
        pid = None if rng.random() < 0.10 else rng.choice(policy_ids)
        if pid is not None and rng.random() < 0.05:
            pid = _hex_id(rng)  # orphan FK
        payments.append((
            _hex_id(rng),
            pid,
            round(rng.uniform(-100, 3000), 2),  # fault 8 (negatives)
            _date(rng),
        ))

    rows = {
        "clients": clients, "crm_clients": crm, "vehicles": vehicles,
        "policies": policies, "claims": claims, "payments": payments,
    }
    return {
        name: spark.createDataFrame(data, schema=RAW_SCHEMAS[name])
        for name, data in rows.items()
    }
