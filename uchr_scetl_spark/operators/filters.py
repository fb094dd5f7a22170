"""§2.2 projection / filter / predicates — pure Column expressions so
every predicate reaches the parquet scan as a PushedFilter."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "project_select",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + computed columns (identical expression trees on
    both engines → bit-equal doubles)."""
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (F.lit(1) + F.col("l_tax"))).alias("charge"),
    )


@query(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE (l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           AND l_discount BETWEEN 0.03 AND 0.07
           AND l_quantity < 25)
       OR (l_returnflag = 'R' AND l_quantity IN (1, 2, 3))
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunction/disjunction, BETWEEN, IN — all pushdown-eligible."""
    li = load(spark, sf_dir, "lineitem")
    in_97 = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    disc = F.col("l_discount").between(0.03, 0.07) & (F.col("l_quantity") < 25)
    returned_small = (F.col("l_returnflag") == "R") & F.col("l_quantity").isin(1, 2, 3)
    return li.where((in_97 & disc) | returned_small).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


@query(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_type LIKE 'PROMO%' AND p_name NOT LIKE '%z%'
      AND p_brand LIKE 'Brand#1%'
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / NOT LIKE pattern predicates (StartsWith/Contains pushdown)."""
    p = load(spark, sf_dir, "part")
    return p.where(
        F.col("p_type").like("PROMO%")
        & ~F.col("p_name").like("%z%")
        & F.col("p_brand").like("Brand#1%")
    ).select("p_partkey", "p_name", "p_brand", "p_type")
