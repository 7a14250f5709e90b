"""ML-prep operators: per-group fitting / normalization.

Demonstrates the grouped-pandas API surface (``applyInPandas``): each
group arrives as one Arrow-backed pandas DataFrame, numpy computes, a
compact result row leaves. Use ONLY when the per-group computation is
genuinely not expressible as SQL aggregates — for linear regression it
IS expressible (``regr_slope``/``regr_intercept``), which the test uses
as the oracle for the pandas path.

Scale note: applyInPandas shuffles whole groups to single tasks — a
mega-group OOMs the worker. Guard rails: only use for bounded-size
groups (per-entity model fits), never per-popular-key aggregation; that
is what the SQL aggregates and salted_agg are for.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def grouped_linear_fit(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group OLS fit of ``y ~ x`` via applyInPandas (numpy lstsq).
    Returns (group, slope, intercept, n). The group column keeps its
    input type (same contract as :func:`native_linear_fit`)."""
    out_schema = T.StructType([
        T.StructField(group_col, df.schema[group_col].dataType),
        T.StructField("slope", T.DoubleType()),
        T.StructField("intercept", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ])

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        x = pdf[x_col].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        if n < 2 or np.ptp(x) == 0:
            slope, intercept = float("nan"), float("nan")
        else:
            a = np.vstack([x, np.ones(n)]).T
            slope, intercept = np.linalg.lstsq(a, y, rcond=None)[0]
        return pd.DataFrame({
            group_col: [pdf[group_col].iloc[0]],
            "slope": [float(slope)],
            "intercept": [float(intercept)],
            "n": [n],
        })

    return df.groupBy(group_col).applyInPandas(_fit, out_schema)


def native_linear_fit(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """The same fit as native SQL aggregates — the preferred form (one
    partial+final hash aggregation, no Python, no whole-group shuffle)."""
    return df.groupBy(group_col).agg(
        F.regr_slope(y_col, x_col).alias("slope"),
        F.regr_intercept(y_col, x_col).alias("intercept"),
        F.count(F.lit(1)).alias("n"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling for dataset balancing (e.g.
    down-weighting an over-represented language or source). Thin wrapper
    over ``sampleBy`` — one narrow pass, no shuffle; seeded so a rerun
    reproduces the same sample (per-row hash decision, independent of
    partitioning)."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def export_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    shuffle_seed: int = 42,
    order_col: str | None = None,
) -> None:
    """Write a training-ready sharded dataset: exactly ``n_shards``
    similarly-sized parquet files, rows pseudo-randomly (seeded) assigned
    to shards so each shard is an unbiased sample — the layout data
    loaders expect (shard-per-worker, deterministic restart).

    ``repartition(n, expr)`` hash-distributes on a seeded per-row hash —
    a full shuffle, paid once at export. ``order_col`` optionally sorts
    within each shard (e.g. by length for batching efficiency).
    """
    key = F.xxhash64(*[F.col(c) for c in df.columns], F.lit(shuffle_seed))
    out = df.repartition(n_shards, key)
    if order_col is not None:
        out = out.sortWithinPartitions(order_col)
    out.write.mode("overwrite").parquet(path)
