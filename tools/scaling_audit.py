"""Multi-scale wall-time audit for the heaviest gate queries — the
committed form of the per-round "would this survive a scale-up" check
(VERDICT r8 #1: push the scale evidence past the 10x replica toward
the sandbox's limit).

For each scale (label=sf_dir pair) a FRESH subprocess builds one
fixed-size session (local[32], 32 shuffle partitions, 16g driver heap
— the same cap at every scale, so a query that needs more memory at
30x FAILS here instead of silently growing the heap) and runs each
query through the noop sink: one untimed warmup pass, then min-of-2
timed passes (same rationale as bench.py — min measures the engine,
not host load spikes). The parent then fits per-query scaling
exponents between consecutive scales:

    alpha = log(t_b / t_a) / log(K_b / K_a)

alpha == 1 is linear scaling, < 1 sub-linear (fixed-overhead
amortization), > 1 super-linear (the thing this audit exists to
catch). Queries whose exponent exceeds --max-alpha (default 1.10, a
noise allowance over linear) on the LARGEST scale step are listed in
"super_linear" — reported, not failed: a loaded shared box can
inflate one scale's numbers, so the verdict should read the table
against the host fingerprint, not a bare exit code. A query that
CRASHES (e.g. OOM at the fixed cap) is reported in "errors" and DOES
exit 1 — that is a real scale ceiling, not noise.

Replicas come from tools/make_scaled_replica.py (content-perturbed so
near-dup work scales linearly, FK-consistent). Usage:

    python tools/make_scaled_replica.py /root/testdata/sf0.1 /tmp/sfx30 30
    python tools/scaling_audit.py \
        --scales 1=/root/testdata/sf0.1,10=/tmp/sfx10,30=/tmp/sfx30 \
        [query ...]

Default queries: the five most expensive gate entries (minhash LSH,
Gopher repetition family, exact-substring span trim, bigram-LM
perplexity, DSIR weighting). Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])

DEFAULT_QUERIES = (
    "minhash_near_dup",
    "gopher_quality",
    "duplicate_span_trim",
    "lm_perplexity",
    "dsir_log_weights",
)

CHILD_FLAG = "--child"


def child(sf_dir: str, names: list[str]) -> None:
    """One scale's measurement, in its own JVM/process."""
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("scaling_audit")
        .getOrCreate()
    )
    from datawarehouse_vehicule_insurance_spark import queries as Q

    # warm the JIT/codegen, parquet footer caches and Python worker pool
    Q.q_pricing_summary(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, float | str] = {}
    registry = {**Q.QUERIES, **Q.BENCH_EXTRA,
                **getattr(Q, "AUDIT_VARIANTS", {})}
    for name in names:
        fn = registry[name]
        try:
            best = math.inf
            for p in range(3):  # pass 0 = untimed warmup
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                if p > 0:
                    best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 3)
        except Exception as e:  # noqa: BLE001 — report, don't die
            out[name] = f"ERROR: {type(e).__name__}: {e}"[:400]
    print("\n" + json.dumps({"sf_dir": sf_dir, "timings": out}))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(CHILD_FLAG, dest="child_sf", help=argparse.SUPPRESS)
    ap.add_argument(
        "--scales",
        default="1=/root/testdata/sf0.1,10=/tmp/sfx10,30=/tmp/sfx30",
        help="comma list of K=sf_dir, ascending K",
    )
    ap.add_argument("--max-alpha", type=float, default=1.10)
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = list(args.queries) or list(DEFAULT_QUERIES)

    if args.child_sf:
        child(args.child_sf, names)
        return 0

    # fail fast on a typo'd query name BEFORE paying a Spark session
    # per scale (the child's KeyError would otherwise surface as an
    # opaque "child failed rc=1" per scale)
    sys.path.insert(0, REPO)
    from datawarehouse_vehicule_insurance_spark import queries as _Q

    known = {**_Q.QUERIES, **_Q.BENCH_EXTRA,
             **getattr(_Q, "AUDIT_VARIANTS", {})}
    unknown = [n for n in names if n not in known]
    if unknown:
        print(f"unknown queries: {unknown} (not in QUERIES/BENCH_EXTRA/"
              "AUDIT_VARIANTS)", file=sys.stderr)
        return 2

    scales: list[tuple[float, str]] = []
    for part in args.scales.split(","):
        k, _, d = part.partition("=")
        scales.append((float(k), d))
    scales.sort()

    load_before = os.getloadavg()
    per_scale: dict[float, dict] = {}
    errors: list[str] = []
    for k, d in scales:
        if not os.path.isdir(d):
            errors.append(
                f"scale {k}: {d} is not a directory — build the replica"
            )
            continue
        try:
            proc = subprocess.run(
                [sys.executable, __file__, CHILD_FLAG, d, *names],
                capture_output=True, text=True, timeout=3600,
            )
        except subprocess.TimeoutExpired:
            errors.append(
                f"scale {k}: child exceeded 3600s — a real scale "
                "ceiling or a heavily loaded host"
            )
            continue
        line = next(
            (ln for ln in reversed(proc.stdout.splitlines())
             if ln.startswith("{")), None,
        )
        if proc.returncode != 0 or line is None:
            errors.append(
                f"scale {k}: child failed rc={proc.returncode}: "
                + proc.stderr.strip().splitlines()[-1][:300]
                if proc.stderr.strip() else f"scale {k}: no output"
            )
            continue
        per_scale[k] = json.loads(line)["timings"]
        for q, v in per_scale[k].items():
            if isinstance(v, str):
                errors.append(f"{q} @ {k}x: {v}")

    # per-step and full-range exponents
    ks = sorted(per_scale)
    exponents: dict[str, dict[str, float]] = {}
    super_linear: list[str] = []
    for q in names:
        ex: dict[str, float] = {}
        for a, b in zip(ks, ks[1:]):
            ta, tb = per_scale[a].get(q), per_scale[b].get(q)
            if isinstance(ta, (int, float)) and isinstance(tb, (int, float)):
                ex[f"{a:g}->{b:g}"] = round(
                    math.log(tb / ta) / math.log(b / a), 3
                )
        if len(ks) >= 2:
            ta, tb = per_scale[ks[0]].get(q), per_scale[ks[-1]].get(q)
            if isinstance(ta, (int, float)) and isinstance(tb, (int, float)):
                full = math.log(tb / ta) / math.log(ks[-1] / ks[0])
                ex["full"] = round(full, 3)
                # EITHER signal flags: super-linear growth often shows
                # only at the largest step (a join starting to spill)
                # while the full-range fit still averages below the
                # threshold — requiring both would drop exactly the
                # scale-ceiling signal this audit exists to catch
                if ex.get(f"{ks[-2]:g}->{ks[-1]:g}", 0) > args.max_alpha \
                        or full > args.max_alpha:
                    super_linear.append(q)
        exponents[q] = ex

    print(json.dumps({
        "scales": {f"{k:g}": d for k, d in scales},
        "timings": {f"{k:g}": per_scale.get(k, {}) for k in ks},
        "exponents": exponents,
        "super_linear": super_linear,
        "errors": errors,
        "host": {
            "loadavg_before": [round(x, 2) for x in load_before],
            "loadavg_after": [round(x, 2) for x in os.getloadavg()],
        },
        "memory_cap": "16g driver heap, local[32], 32 shuffle partitions",
    }))
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
