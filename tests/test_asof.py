"""As-of join operator vs pandas merge_asof (the reference semantics:
backward search, exact matches allowed)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from datawarehouse_vehicule_insurance_spark.operators.asof import asof_join


def test_asof_join_matches_pandas_merge_asof(spark):
    from datawarehouse_vehicule_insurance_spark.queries import _events

    events = _events(spark, "/root/testdata/sf0.001")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value", "event_id"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    got_df = asof_join(
        purchases, clicks,
        on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["ts", "value"], right_id="event_id",
    )
    got = {
        r["purchase_id"]: (r["asof_ts"], r["asof_value"])
        for r in got_df.collect()
    }

    pclicks = clicks.toPandas().sort_values("ts").reset_index(drop=True)
    ppurch = purchases.toPandas().sort_values("ts").reset_index(drop=True)
    merged = pd.merge_asof(
        ppurch, pclicks.rename(columns={"ts": "c_ts", "value": "c_value"}),
        left_on="ts", right_on="c_ts", by="user_id",
        direction="backward", allow_exact_matches=True,
    )
    assert len(got) == len(ppurch)
    for row in merged.itertuples():
        g_ts, g_val = got[row.purchase_id]
        if pd.isna(row.c_ts):
            assert g_ts is None and g_val is None
        else:
            assert g_ts == row.c_ts.to_pydatetime()
            assert g_val == row.c_value


def test_asof_join_no_prior_right_row(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 5, "b"), (2, 50, "c")],
        "key int, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 10, 1.5, 900), (1, 100, 2.5, 901), (3, 1, 9.9, 902)],
        "key int, t long, v double, rid long",
    )
    out = asof_join(
        left, right, on="key", left_ts="t", right_ts="t",
        right_payload=["v"], right_id="rid",
    )
    got = {r["name"]: r["asof_v"] for r in out.collect()}
    # 'a': t=100 → exact match at t=100 wins (allow_exact_matches)
    # 'b': t=5 → no click at or before → NULL
    # 'c': key=2 has no right rows at all → NULL
    assert got == {"a": 2.5, "b": None, "c": None}


def test_time_range_join_matches_bruteforce(spark):
    """Bucketized range join ≡ brute-force theta join on the same data,
    including bucket-boundary cases."""
    import datetime as dt

    from datawarehouse_vehicule_insurance_spark.operators.rangejoin import (
        time_range_join,
    )

    base = dt.datetime(2024, 1, 1)
    lefts = [(i, base + dt.timedelta(seconds=s)) for i, s in
             enumerate([0, 5, 10, 17, 20, 30, 3600, 3605])]
    rights = [(100 + i, base + dt.timedelta(seconds=s), float(i)) for i, s in
              enumerate([0, 4, 9, 10, 11, 20, 29, 31, 3599, 3600])]
    L = spark.createDataFrame(lefts, "lid int, p_ts timestamp")
    R = spark.createDataFrame(rights, "rid int, c_ts timestamp, v double")

    got = {
        (r["lid"], r["rid"])
        for r in time_range_join(L, R, "p_ts", "c_ts", 10).collect()
    }
    want = {
        (r["lid"], r["rid"])
        for r in L.crossJoin(R)
        .filter(
            (R.c_ts <= L.p_ts)
            & (R.c_ts >= L.p_ts - F.expr("INTERVAL 10 SECONDS"))
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_time_range_join_left_keeps_unmatched(spark):
    """how='left' preserves left rows with no right row in the window
    (the predicate lives in the join condition, not a post-filter)."""
    import datetime as dt

    from datawarehouse_vehicule_insurance_spark.operators.rangejoin import (
        time_range_join,
    )

    base = dt.datetime(2024, 1, 1)
    lefts = [(0, base), (1, base + dt.timedelta(seconds=500))]
    rights = [(100, base - dt.timedelta(seconds=2), 1.0)]
    L = spark.createDataFrame(lefts, "lid int, p_ts timestamp")
    R = spark.createDataFrame(rights, "rid int, c_ts timestamp, v double")

    out = {
        (r["lid"], r["rid"])
        for r in time_range_join(L, R, "p_ts", "c_ts", 10, how="left")
        .collect()
    }
    # left 0 matches right 100 (2s before); left 1 has nothing in window
    assert out == {(0, 100), (1, None)}

    inner = {
        (r["lid"], r["rid"])
        for r in time_range_join(L, R, "p_ts", "c_ts", 10).collect()
    }
    assert inner == {(0, 100)}
