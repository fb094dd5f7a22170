"""Deterministic sampling / splitting for training-data pipelines.

Both operators derive randomness from md5 of stable row keys instead of
an RNG: the result is identical across retries, executors, engines, and
partitionings — the property a 100 TB pipeline needs for reproducible
dataset releases — and because both engines compute the same md5 hex
string, the operators are fully SQL-oracle-checked (a seeded
``sample()``/``sampleBy()`` would be engine-specific → rows-only).

Scale shape: both are one narrow map over the corpus; the stratified
variant adds one shuffle on the stratum key for the per-stratum window
(bounded state: top-N heap per stratum under codegen'd WindowExec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import query

STRATUM_N = 40  # per-language sample size
TEST_PREFIX = "2a"  # md5-hex threshold ≈ 16.4% test fraction


@query(
    "sample_stratified",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(concat(CAST(doc_id AS VARCHAR), ':', text)), doc_id
             ) AS rn
      FROM documents
    )
    SELECT doc_id, lang, source FROM ranked WHERE rn <= {STRATUM_N}
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-class downsample: N docs per language, chosen by
    ordering each stratum on an md5 of the row key — a uniform
    pseudo-random draw that every engine reproduces bit-for-bit."""
    d = load(spark, sf_dir, "documents")
    r = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text")))
    w = Window.partitionBy("lang").orderBy(r, "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= STRATUM_N)
        .select("doc_id", "lang", "source")
    )


@query(
    "sample_split_assign",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{TEST_PREFIX}'
                THEN 'test' ELSE 'train' END AS split
    FROM documents
    """,
)
def sample_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/test split: membership is a pure function of
    the row key (md5-hex compared against a prefix threshold), so the
    assignment survives re-runs, backfills, and engine migrations —
    no split file to persist, no RNG state."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        F.when(
            F.md5(F.col("doc_id").cast("string")) < TEST_PREFIX, "test"
        )
        .otherwise("train")
        .alias("split"),
    )
