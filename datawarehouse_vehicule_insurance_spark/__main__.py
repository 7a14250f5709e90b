"""CLI entry points mirroring the reference's three layer scripts
(reference: load_bronze.py:109-120, load_silver.py:259-265,
load_gold.py:142-154):

    python -m datawarehouse_vehicule_insurance_spark bronze --root <lake> --csv-root <dir>
    python -m datawarehouse_vehicule_insurance_spark silver --root <lake> [--ref-date YYYY-MM-DD]
    python -m datawarehouse_vehicule_insurance_spark gold   --root <lake>

``--root`` may be a local path or ``s3a://bucket/prefix`` (credentials
from the same env contract as the reference, SURVEY.md §2.7 O2).

Additive (beyond the reference): the training-corpus curation pipeline
over a documents parquet table —

    python -m datawarehouse_vehicule_insurance_spark curate \\
        --input <docs.parquet> --output <dir> [--benchmark <bench.parquet>]
        [--langs en,es] [--min-tokens 8] [--jaccard 0.8]
        [--existing-corpus <corpus.parquet>]   # incremental ingest mode
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys

from datawarehouse_vehicule_insurance_spark import get_spark
from datawarehouse_vehicule_insurance_spark.catalog import Catalog
from datawarehouse_vehicule_insurance_spark.plans.pipeline import Pipeline


def _run_curate(args: argparse.Namespace) -> int:
    """Curate a documents table: read parquet, run the cost-ordered
    curation plan, write survivors; prints one JSON line of counts."""
    from datawarehouse_vehicule_insurance_spark.operators.curate import (
        curate_corpus,
    )

    spark = get_spark(app_name="insurance_curate")
    docs = spark.read.parquet(args.input)
    benchmark = (
        spark.read.parquet(args.benchmark) if args.benchmark else None
    )
    existing = (
        spark.read.parquet(args.existing_corpus)
        if args.existing_corpus else None
    )
    langs = tuple(args.langs.split(",")) if args.langs else None
    out = curate_corpus(
        docs,
        benchmark,
        lang_allow=langs,
        min_tokens=args.min_tokens,
        jaccard_threshold=args.jaccard,
        existing_corpus=existing,
    )
    out.write.mode("overwrite").parquet(args.output)
    kept = spark.read.parquet(args.output).count()
    print(json.dumps({"input": docs.count(), "kept": kept}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="datawarehouse_vehicule_insurance_spark")
    p.add_argument(
        "layer", choices=["bronze", "silver", "gold", "all", "curate"]
    )
    p.add_argument("--root", help="lake root (path or s3a://)")
    p.add_argument("--csv-root", help="raw CSV dir (bronze only)")
    p.add_argument("--ref-date", help="pin 'today' for date rules (YYYY-MM-DD)")
    p.add_argument(
        "--fidelity", choices=["fast", "exact"], default="fast",
        help="title-case mode: initcap (fast) or Python str.title (exact)",
    )
    p.add_argument("--input", help="curate: documents parquet path")
    p.add_argument("--output", help="curate: output parquet dir")
    p.add_argument("--benchmark", help="curate: benchmark parquet path")
    p.add_argument(
        "--existing-corpus",
        help="curate: parquet of the corpus already ingested — makes the "
        "run incremental (batch deduped against it)",
    )
    p.add_argument("--langs", help="curate: comma-separated lang allowlist")
    p.add_argument("--min-tokens", type=int, default=8)
    p.add_argument("--jaccard", type=float, default=0.8)
    args = p.parse_args(argv)

    if args.layer == "curate":
        if not (args.input and args.output):
            p.error("curate requires --input and --output")
        return _run_curate(args)
    if not args.root:
        p.error(f"{args.layer} requires --root")

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
