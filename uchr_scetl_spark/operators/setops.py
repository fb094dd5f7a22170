"""§2.7 set operations. ``unionByName`` everywhere a union appears —
positional unions are a silent-corruption hazard when schemas drift."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "set_union_all",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
    WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
    WHERE c_mktsegment = 'MACHINERY'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two filtered projections — bag semantics, no exchange
    beyond the scans."""
    c = load(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_mktsegment", "c_acctbal"]
    a = c.where(F.col("c_mktsegment") == "BUILDING").select(*cols)
    b = c.where(F.col("c_mktsegment") == "MACHINERY").select(*cols)
    return a.unionByName(b)


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — the union's de-dup is one hash aggregate on the
    combined key set."""
    c = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT via Spark's left-semi de-dup strategy on aligned
    projections."""
    a = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    b = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who ordered but never above 200k (distinct EXCEPT)."""
    o = load(spark, sf_dir, "orders")
    a = o.select("o_custkey")
    b = o.where(F.col("o_totalprice") > 200000).select("o_custkey")
    return a.subtract(b)


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics intersection (keeps duplicate multiplicity) — the
    variant dedup-sensitive reconciliation jobs need."""
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_totalprice") > 300000).select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersectAll(b)
