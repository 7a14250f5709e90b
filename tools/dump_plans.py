"""Dump .explain("formatted") for declared queries into plans/<tag>/.

Usage: python tools/dump_plans.py <tag> <suffix> [sf_dir] [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query (default: every
entry in QUERIES + BENCH_EXTRA). Queries whose construction executes
eager work (model fits, localCheckpoints, asserts) pay that work once —
this tool is for plan capture, not timing.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from datawarehouse_vehicule_insurance_spark import get_spark  # noqa: E402
from datawarehouse_vehicule_insurance_spark import queries as Q  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = set(sys.argv[4:])

    out_dir = Path(_REPO_ROOT) / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="dump_plans", master="local[8]",
                      shuffle_partitions=8)
    registry = dict(Q.QUERIES)
    registry.update(Q.BENCH_EXTRA)
    for name, fn in registry.items():
        if only and name not in only:
            continue
        path = out_dir / f"{name}_{suffix}.txt"
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure, keep going
            plan = f"ERROR during plan capture: {exc!r}\n"
        path.write_text(plan)
        print(f"{name}: wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
