"""Range (interval) join — pair left rows with right rows whose
timestamp falls in a window before/around the left timestamp, WITHOUT a
cross product.

Spark executes a raw theta join (``l.ts BETWEEN r.ts - w AND r.ts``) as
BroadcastNestedLoopJoin — O(|L|·|R|), hopeless at scale. The scalable
formulation buckets time to the window width: a right row at time t can
only match left rows in bucket(t) or bucket(t)+1, so duplicating the
right side into (at most) two coarse buckets turns the range join into
an EQUI-join on the bucket id followed by the precise window filter.
Shuffle is keyed by time bucket — bounded fan-out, AQE-splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows with
    ``left_ts - window_seconds <= right_ts <= left_ts``.

    Both inputs keep all their columns (names must not collide). The
    equi-join key is the coarse time bucket of width ``window_seconds``;
    right rows are exploded into the two buckets they can serve. The
    precise window predicate lives IN the join condition (not a
    post-filter) so ``how='left'`` keeps unmatched left rows with NULL
    right columns instead of silently degrading to inner semantics.
    A right row duplicated into two buckets can match a given left row
    through at most one of them (the left row has a single bucket), so
    no dedup is needed.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"time_range_join supports inner/left, got '{how}'")
    w = F.lit(window_seconds)
    l_b = (F.unix_timestamp(F.col(left_ts)) / w).cast("long")
    r_sec = F.unix_timestamp(F.col(right_ts))
    l_tagged = left.withColumn("__bucket_l", l_b)
    r_tagged = right.withColumn(
        "__bucket_r",
        F.explode(
            F.array_distinct(
                F.array(
                    (r_sec / w).cast("long"),
                    (r_sec / w).cast("long") + 1,
                )
            )
        ),
    )
    cond = (
        (F.col("__bucket_l") == F.col("__bucket_r"))
        & (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.col(left_ts) - F.make_dt_interval(secs=w))
    )
    return (
        l_tagged.join(r_tagged, cond, how)
        .drop("__bucket_l", "__bucket_r")
    )
