"""CLI entry points mirroring the reference's three layer scripts
(reference: load_bronze.py:109-120, load_silver.py:259-265,
load_gold.py:142-154):

    python -m datawarehouse_vehicule_insurance_spark bronze --root <lake> --csv-root <dir>
    python -m datawarehouse_vehicule_insurance_spark silver --root <lake> [--ref-date YYYY-MM-DD]
    python -m datawarehouse_vehicule_insurance_spark gold   --root <lake>

``--root`` may be a local path or ``s3a://bucket/prefix`` (credentials
from the same env contract as the reference, SURVEY.md §2.7 O2).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys

from datawarehouse_vehicule_insurance_spark import get_spark
from datawarehouse_vehicule_insurance_spark.catalog import Catalog
from datawarehouse_vehicule_insurance_spark.plans.pipeline import Pipeline


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="datawarehouse_vehicule_insurance_spark")
    p.add_argument("layer", choices=["bronze", "silver", "gold", "all"])
    p.add_argument("--root", required=True, help="lake root (path or s3a://)")
    p.add_argument("--csv-root", help="raw CSV dir (bronze only)")
    p.add_argument("--ref-date", help="pin 'today' for date rules (YYYY-MM-DD)")
    p.add_argument(
        "--fidelity", choices=["fast", "exact"], default="fast",
        help="title-case mode: initcap (fast) or Python str.title (exact)",
    )
    args = p.parse_args(argv)

    ref_date = dt.date.fromisoformat(args.ref_date) if args.ref_date else None
    spark = get_spark(app_name=f"insurance_{args.layer}")
    pipe = Pipeline(
        spark, Catalog(root=args.root), ref_date=ref_date,
        fidelity=args.fidelity,
    )

    if args.layer in ("bronze", "all"):
        if not args.csv_root:
            p.error("bronze requires --csv-root")
        pipe.run_bronze(args.csv_root)
    if args.layer in ("silver", "all"):
        pipe.run_silver()
    if args.layer in ("gold", "all"):
        pipe.run_gold()

    print(json.dumps(pipe.results))
    return 0 if all(v == "ok" for v in pipe.results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
