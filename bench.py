"""Benchmark harness: runs the query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the FULL
per-query JSON line first ({"metric": ..., "value": total_sec, "unit":
"sec", "queries": {name: sec}, "sf": ..., "host": {...}}), then a compact
summary JSON line LAST ({"kind": "compact", "metric", "value",
"registry_value", "unit", "sf", "noisy", "canary_sec", "registry_md5"} —
short enough that a tail-capture window always ends with it intact; the
r10 compact-FIRST ordering scrolled it out and clipped the long line).

Both lines carry ``canary_sec`` (r11 verdict #2): the wall time of a
pinned pure-CPU Spark job — sum of xxhash64 over spark.range(2B) —
measured min-of-3 on the same session right before the suite. It is a
host-speed yardstick with zero I/O and a fixed plan, so cross-round
comparison can use the computed ratio registry_value/canary_sec instead
of a prose host-drift argument.

Each query executes via the noop sink — full computation, no driver-side
collect, matching how a production pipeline consumes results.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from datawarehouse_vehicule_insurance_spark import get_spark  # noqa: E402
from datawarehouse_vehicule_insurance_spark import queries as Q  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    # warmup: JIT/codegen + parquet footer caches + the Python worker pool
    # (first pandas_udf call pays ~5s of worker spawn), not measured
    Q.q_pricing_summary(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    from datawarehouse_vehicule_insurance_spark.functions.text import title_exact
    from pyspark.sql import functions as F

    spark.range(1).select(title_exact(F.lit("warm up"))).collect()

    # loadavg sampled BEFORE the canary: the canary itself is ~5s of
    # full-32-core work, which would inflate the 1-min loadavg and
    # could trip the noisy flag on a genuinely quiet box — keep the
    # sample point where every prior round took it (post-warmup,
    # pre-any-measured-work) so the noisy rule stays comparable
    load_before = os.getloadavg()

    # Host-speed canary (r11 verdict #2): a pinned pure-CPU job with a
    # fixed plan and zero I/O — sum of xxhash64 over range(2B). Its
    # min-of-3 wall time moves with HOST speed (load, thermal, co-
    # tenancy) and with nothing in this repo, so
    # registry_value / canary_sec is a computed cross-round
    # normalization where previous rounds had a prose host-drift
    # argument. Measured min-of-3 like the suite, one throwaway
    # warm pass first (codegen for this exact plan).
    def _canary_once() -> float:
        t0 = time.perf_counter()
        # modulo before the sum: 2e9 terms each < 1e9 tops out ~2e18,
        # inside long range — a raw sum of xxhash64 longs overflows
        # under Spark 4's default ANSI mode
        spark.range(2_000_000_000).select(
            F.sum(F.xxhash64("id") % F.lit(1_000_000_007))
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # min-of-5 (vs the suite's min-of-3): measured r12, a single
    # canary run jitters ~25% peak-to-peak on this host REGARDLESS of
    # job length (2e9 and 8e9 rows both spread ~0.23-0.27 relative),
    # so a longer job buys nothing and more samples buy a tighter min.
    # Even so, treat canary_sec as ±10% between quiet runs: it detects
    # the LARGE host drifts (co-tenancy, thermal throttle, 1.5-2x)
    # that previously cost rounds of re-attribution, not 5% effects.
    _canary_once()  # warm: codegen + stage setup, not measured
    canary = round(min(_canary_once() for _ in range(5)), 4)

    # three passes, report the min per query: the host shows
    # intermittent load spikes that can inflate a single cold run
    # 3-10x; min-of-3 measures the engine (steady-state plan
    # execution), not the noise. The load fingerprint below lets a
    # cross-round comparison separate code drift from host drift.
    PASSES = 3
    timings: dict[str, float] = {}
    bench_set = {**Q.QUERIES, **getattr(Q, "BENCH_EXTRA", {})}
    for _pass in range(PASSES):
        for name, fn in bench_set.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 4)
            timings[name] = min(timings.get(name, elapsed), elapsed)
    load_after = os.getloadavg()

    def _n_pids() -> int:
        try:
            return sum(1 for p in os.listdir("/proc") if p.isdigit())
        except OSError:
            return -1

    # noisy-run annotation (r8 verdict #5 follow-through): a loaded
    # box inflates even min-of-3 timings (the r5/r7/r8 rounds each
    # burned verdict space re-attributing host noise). Thresholds from
    # the recorded history on this 32-core box: quiet anchors ran at
    # loadavg 0.05-2.8; the runs that needed re-attribution started at
    # 1-min 6-24 or 5-min ~8.7. The flag REPORTS, never refuses — the
    # driver must always get its number — and the reading rule lives
    # in NOTES.md: a noisy=true BENCH_r*.json is compared per-query
    # against the prior round's QUIET anchor, not suite-to-suite.
    noisy = load_before[0] > 4.0 or load_before[1] > 8.0

    total = round(sum(timings.values()), 4)
    # registry_value = the 50 driver-gated queries only — the number
    # comparable across rounds when BENCH_EXTRA (rotated-out,
    # bench-only queries) changes the full-suite composition
    registry = round(
        sum(v for q, v in timings.items() if q in Q.QUERIES), 4
    )
    registry_md5 = hashlib.md5(
        ",".join(sorted(Q.QUERIES)).encode()
    ).hexdigest()[:12]
    # Full per-query line FIRST, compact summary LAST (r10 verdict
    # #3, attempt two): the driver TAIL-captures stdout, so whatever
    # prints last survives; r10's compact-line-FIRST fix scrolled the
    # short line out behind the ~2.5 KB per-query line and the tail
    # clipped the long line's front (BENCH_r10.json parsed: null).
    # With the long line first, the tail window always ends with the
    # short compact line intact — and if the window happens to hold
    # both, both parse.
    print(json.dumps({
        "metric": "query_suite_wall_time",
        "value": total,
        "registry_value": registry,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        # host-speed canary: min-of-3 wall of the pinned pure-CPU job
        # (docstring) — divide registry_value by this to normalize a
        # cross-round comparison for host drift
        "canary_sec": canary,
        # host-load fingerprint: 1/5/15-min loadavg sampled before and
        # after the timed passes, plus the live PID count — a loaded
        # box (loadavg >> 32 or a PID spike) explains a slow round
        # without blaming the code
        "host": {
            "loadavg_before": [round(x, 2) for x in load_before],
            "loadavg_after": [round(x, 2) for x in load_after],
            "n_pids": _n_pids(),
            "passes": PASSES,
            "agg": "min",
            "noisy": noisy,
            "noisy_rule": "loadavg1>4 or loadavg5>8 at start",
        },
        # registry_value is only comparable across rounds while the
        # 50-slot registry's COMPOSITION is unchanged — this
        # fingerprint (md5 of the sorted gate names) flags a rotation
        # so a cross-round diff doesn't misread composition drift as
        # code drift
        "registry_md5": registry_md5,
    }))
    print(json.dumps({
        # discriminator (r11 verdict nit): both lines share metric /
        # value fields; "kind" lets a parser tell the tail-survivable
        # compact line from the full per-query line unambiguously
        "kind": "compact",
        "metric": "query_suite_wall_time",
        "value": total,
        "registry_value": registry,
        "unit": "sec",
        "sf": sf_dir,
        "noisy": noisy,
        "canary_sec": canary,
        "registry_md5": registry_md5,
    }))


if __name__ == "__main__":
    main()
