"""As-of join — for each left row, the most recent right row at or
before its timestamp, per key. Spark has no native ASOF JOIN; the
scalable formulation is the union + running-window trick:

1. union left and right rows into one stream tagged by side;
2. one sort-shuffle per key ordered by (ts, side, tiebreak);
3. carry the right side's payload forward with
   ``last(..., ignorenulls=True)`` over an unbounded-preceding window;
4. keep only left rows.

Cost: ONE shuffle of |L| + |R| rows — no range-join explosion, no
per-row binary search, and AQE handles key skew. This is the shape that
survives 100 TB; a broadcast-range join only wins when one side is tiny.

Ties: right rows sort BEFORE left rows at equal timestamps (exact
matches are included, like pandas ``merge_asof(allow_exact_matches=
True)``), and equal-timestamp right rows are ordered by ``right_id`` so
the winner is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    right_id: str | None = None,
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Return ``left`` with ``{payload_prefix}{col}`` columns holding the
    payload of the latest ``right`` row (per ``on`` key) whose
    ``right_ts`` ≤ ``left_ts``; NULL when no prior right row exists."""
    lcols = left.columns
    payload_out = [f"{payload_prefix}{c}" for c in right_payload]

    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tie"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(p)
          for c, p in zip(right_payload, payload_out)],
    )
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        (F.col(right_id) if right_id else F.lit(0)).cast("long").alias("__tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(p) for c, p in zip(right_payload, payload_out)],
    )

    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__is_left", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r_tagged.unionByName(l_tagged).select(
        "*",
        *[
            F.last(p, ignorenulls=True).over(w).alias(f"__c_{p}")
            for p in payload_out
        ],
    )
    return (
        carried.filter(F.col("__is_left") == 1)
        .select(
            *lcols,
            *[F.col(f"__c_{p}").alias(p) for p in payload_out],
        )
    )
