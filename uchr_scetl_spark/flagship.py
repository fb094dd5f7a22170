"""Flagship query — the engine's end-to-end showcase plan.

One pipeline that touches every layer the engine is built on:
parquet scan (filter + projection pushed down) → broadcast dim joins
(region⋈nation⋈customer, no fact shuffle for dims) → one fact shuffle
(orders⋈lineitem on orderkey) → partial+final hash aggregation →
deterministic order. The shape is the TPC-H Q1/Q5 hybrid from
SURVEY.md §7 Phase 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .exprs import dec_sum
from .io import load


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup per (region, nation, returnflag)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    dims = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        c.join(F.broadcast(dims), c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("r_name", "n_name", "l_returnflag")
        .agg(
            dec_sum(rev, "revenue"),
            F.sum("l_quantity").alias("sum_qty"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("r_name", "n_name", "l_returnflag")
    )
