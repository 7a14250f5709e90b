"""Scale utilities: skew-safe aggregation, partitioned-write helpers.

These encode the 100-TB playbook (SURVEY.md §7.2 step 7) as reusable
operators:

- :func:`salted_agg` — two-phase aggregation for skewed group keys. AQE's
  skew-join splitting handles joins, but a single mega-group in a groupBy
  still lands on one reducer; salting splits it N ways then re-combines.
- :func:`with_date_partitions` — derive year/month partition columns for
  date-partitioned fact writes (Catalyst partition pruning on read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregates that can be split into (partial per salt) → (final combine)
_COMBINERS: dict[str, tuple] = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "max": (F.max, F.max),
    "min": (F.min, F.min),
}


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe ``groupBy(key).agg(...)``: phase 1 groups on
    (key, random salt) so a hot key spreads over ``salt_buckets``
    reducers; phase 2 combines the partials on the key alone (tiny input
    — one row per key per salt).

    ``aggs`` maps output column name → (function, input column), with
    function ∈ {sum, count, max, min} (the decomposable aggregates; avg =
    sum/count composed by the caller).

    Equivalent to the plain aggregation (tested), with the shuffle-skew
    profile flattened. Use when a key's row share is large enough that
    one reducer becomes the straggler — e.g. a boilerplate document hash
    or a mega-client id.
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _COMBINERS:
            raise ValueError(
                f"{name}: '{fn}' is not decomposable; use sum/count/max/min"
            )

    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(key, "__salt").agg(*[
        _COMBINERS[fn][0](col).alias(f"__p_{name}")
        for name, (fn, col) in aggs.items()
    ])
    final = partial.groupBy(key).agg(*[
        _COMBINERS[fn][1](f"__p_{name}").alias(name)
        for name, (fn, col) in aggs.items()
    ])
    return final


def with_date_partitions(
    df: DataFrame, date_col: str, granularity: str = "month"
) -> DataFrame:
    """Append partition columns derived from a date/timestamp column for
    partitioned fact writes: ``year`` (+ ``month`` when granularity is
    'month'). Readers filtering on these columns get directory-level
    partition pruning."""
    out = df.withColumn("year", F.year(date_col))
    if granularity == "month":
        out = out.withColumn("month", F.month(date_col))
    return out


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (+ sorted) table: rows are hash-partitioned
    into ``n_buckets`` files per partition by ``bucket_col`` at WRITE
    time, so later joins/aggregations on that column read co-located
    data and skip the shuffle entirely (the plan shows a SortMergeJoin
    with NO Exchange). The 100-TB pattern for fact-to-fact joins that
    recur on the same key — pay the partitioning once at ingest."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def explain_shuffles(df: DataFrame) -> dict[str, int]:
    """Count exchange/broadcast nodes in the executed plan — a cheap
    plan-quality probe used by tests to assert shuffle budgets."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": plan.count("Exchange"),
        "broadcasts": plan.count("BroadcastExchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
    }
