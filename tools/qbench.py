"""Micro-bench a subset of registry queries: min-of-N noop-sink walls.

Usage: python tools/qbench.py [--sf DIR] [--passes N] query [query ...]

Same methodology as bench.py (construction + noop write timed, min over
passes) but scoped to named queries so an optimization loop iterates in
seconds instead of a full-suite run. NOT the driver bench — numbers here
guide work; BENCH_r*.json numbers are the record.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from datawarehouse_vehicule_insurance_spark import get_spark  # noqa: E402
from datawarehouse_vehicule_insurance_spark import queries as Q  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    passes = 3
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i:i + 2]
    names = args

    spark = get_spark(app_name="qbench", master="local[32]",
                      shuffle_partitions=32)
    registry = {**Q.QUERIES, **getattr(Q, "BENCH_EXTRA", {})}

    # warmup (mirrors bench.py): codegen + footer caches + python pool
    Q.q_pricing_summary(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    from pyspark.sql import functions as F

    from datawarehouse_vehicule_insurance_spark.functions.text import (
        title_exact,
    )
    spark.range(1).select(title_exact(F.lit("warm up"))).collect()

    timings: dict[str, float] = {}
    for _ in range(passes):
        for name in names:
            fn = registry[name]
            spark.sparkContext.setJobDescription(f"qbench:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = round(time.perf_counter() - t0, 4)
            timings[name] = min(timings.get(name, el), el)
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": sf_dir, "passes": passes, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
