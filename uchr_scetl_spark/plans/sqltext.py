"""Pure-SQL surface: the same engine through ``spark.sql`` text.

Everything else in the registry drives the DataFrame API; analysts
drive SQL strings. This module proves the textual surface end-to-end:
temp-view registration, multi-CTE composition, window + join + agg in
one statement — compiled by the same Catalyst pipeline to the same
physical plans (the DataFrame and SQL paths share the optimizer, so
every plan property asserted in tests/test_plans.py holds here too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load
from ..registry import query

_SQL = """
WITH cust_totals AS (
  SELECT o.o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(24,6))) AS DOUBLE)
           AS total_spend
  FROM {orders} o
  WHERE o.o_orderstatus <> 'P'
  GROUP BY o.o_custkey
),
seg AS (
  SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal
  FROM {customer} c
)
SELECT s.c_mktsegment,
       t.o_custkey,
       t.n_orders,
       t.total_spend,
       CAST(s.c_acctbal AS DOUBLE) AS acctbal
FROM cust_totals t
JOIN seg s ON t.o_custkey = s.c_custkey
ORDER BY t.total_spend DESC, t.o_custkey
LIMIT 50
"""


@query(
    "sql_cte_pipeline",
    oracle=_SQL.format(orders="orders", customer="customer"),
)
def sql_cte_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-CTE SQL text executed verbatim via ``spark.sql`` over
    registered temp views — the identical string (modulo view names)
    is the oracle, so this key checks dialect parity, not just
    results.

    Scale notes: the ORDER BY+LIMIT tail compiles to
    TakeOrderedAndProject (bounded per-partition heaps), NOT a global
    sort — the SQL text and the DataFrame topk_global produce the
    same physical operator; the CTE boundary is no optimization
    fence in Spark (CTEs inline), so the status filter still pushes
    into the orders scan."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("sql_orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("sql_customer")
    return spark.sql(_SQL.format(orders="sql_orders", customer="sql_customer"))
