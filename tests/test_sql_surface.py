"""SQL query surface: zone views + testdata views + spark.sql parity
with the DataFrame formulation."""

from __future__ import annotations

from datawarehouse_vehicule_insurance_spark import sql as SQ
from datawarehouse_vehicule_insurance_spark.queries import (
    q_orders_per_customer,
)


def test_testdata_views_and_sql(spark, sf_dir):
    views = SQ.register_testdata_views(spark, sf_dir)
    assert set(views) == set(SQ.TESTDATA_TABLES)
    df_sql = spark.sql(
        """
        SELECT o_custkey AS client_id,
               count(o_orderkey) AS total_orders,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6)))
                     AS DOUBLE), 2) AS total_spend,
               sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                 AS open_orders
        FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
        """
    )
    df_api = q_orders_per_customer(spark, sf_dir)
    got = {r["client_id"]: r.asDict() for r in df_sql.collect()}
    want = {r["client_id"]: r.asDict() for r in df_api.collect()}
    assert got == want  # SQL and DataFrame APIs produce identical results


def test_events_view_reads_nanos(spark, sf_dir):
    SQ.register_testdata_views(spark, sf_dir)
    n = spark.sql("SELECT count(*) AS n FROM events").collect()[0]["n"]
    assert n > 0
    ts_type = dict(spark.table("events").dtypes)["ts"]
    assert "timestamp" in ts_type
