"""§2.9 similarity search over the `embeddings` vector table.

Cosine arithmetic is pure JVM-side higher-order-function algebra
(``zip_with`` products folded with ``aggregate``), mirrored term-for-
term by DuckDB's ``list_dot_product`` — verified bit-exact, so the
brute-force operators are fully SQL-checked. Norms are projected ONCE
per vector before any pairwise join (recomputing them per pair tripled
the pairwise operators' cost at sf0.1).

Scale design: brute force is the *correctness baseline* and is only
ever probe-bounded (small probe set × corpus = a broadcast join, one
pass over the corpus, no shuffle of the big side). The 100 TB path is
``sim_topk_lsh``: random-hyperplane signatures bucket the corpus
(linear scan, deterministic literal hyperplanes), probes search only
their bucket — candidate volume drops by the bucket fan-out and the
expensive exact re-rank runs on a tiny candidate set. Swapping the
hyperplane prefilter for IVF/e.g. a learned coarse quantizer changes
only the bucket-assignment expression.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import query

N_PROBES = 5  # probe set: vec_id < 5
TOP_K = 3
N_HYPERPLANES = 8  # 256 LSH buckets

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"


def dot_expr(a: str, b: str) -> F.Column:
    """Sequential left-to-right double dot product (bit-equal to
    DuckDB's list_dot_product on DOUBLE[])."""
    return F.expr(_DOT.format(a=a, b=b))


def cosine_expr(a: str, b: str) -> F.Column:
    return dot_expr(a, b) / (
        F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b))
    )


_SQL_DOT = "list_dot_product({a}, {b})"


def sql_cosine(a: str, b: str) -> str:
    d = _SQL_DOT
    return (
        f"({d.format(a=a, b=b)} / "
        f"(sqrt({d.format(a=a, b=a)}) * sqrt({d.format(a=b, b=b)})))"
    )


@query(
    "sim_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ), probes AS (
      SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm
      FROM e WHERE vec_id < {N_PROBES}
    ), scored AS (
      SELECT p.probe_id, e.vec_id AS neighbor_id, e.label,
             (list_dot_product(p.pv, e.v) / (p.pnrm * e.nrm)) AS cosine
      FROM probes p JOIN e ON e.vec_id <> p.probe_id
    )
    SELECT probe_id, neighbor_id, label, cosine
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY probe_id
                               ORDER BY cosine DESC, neighbor_id) <= {TOP_K}
    """,
)
def sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k cosine neighbours for a bounded probe set.

    The probe side is broadcast, so the corpus is scanned once with no
    shuffle; the per-probe top-k is a bounded window over ≤|corpus|
    rows per probe."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    ).withColumn("nrm", F.sqrt(dot_expr("v", "v")))
    probes = e.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("nrm").alias("pnrm"),
    )
    scored = (
        F.broadcast(probes)
        .join(e, F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            (dot_expr("pv", "v") / (F.col("pnrm") * F.col("nrm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("probe_id", "neighbor_id", "label", "cosine")
    )


@query(
    "sim_pairwise_threshold",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label,
           (list_dot_product(a.v, b.v) / (a.nrm * b.nrm)) AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE (list_dot_product(a.v, b.v) / (a.nrm * b.nrm)) >= 0.3
    """,
)
def sim_pairwise_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with cosine ≥ τ *within a label group* — the group
    bound is what keeps the self-join sub-quadratic (shuffle on label,
    pairwise only inside each group)."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    ).withColumn("nrm", F.sqrt(dot_expr("v", "v")))
    a = e.alias("a")
    b = e.alias("b")
    cos = dot_expr("a.v", "b.v") / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(cos >= 0.3)
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            F.col("a.label").alias("label"),
            cos.alias("cosine"),
        )
    )


@query(
    "dedup_embedding",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ), dup_pairs AS (
      SELECT b.vec_id AS b_id
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE (list_dot_product(a.v, b.v) / (a.nrm * b.nrm)) >= 0.45
    )
    SELECT e.vec_id, e.label FROM e
    WHERE e.vec_id NOT IN (SELECT b_id FROM dup_pairs)
    """,
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup removal: within each label group, drop
    every vector that is ≥ τ-similar to a lower-id vector (anti-join
    against the duplicate side of the pair relation)."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    ).withColumn("nrm", F.sqrt(dot_expr("v", "v")))
    a = e.alias("a")
    b = e.alias("b")
    cos = dot_expr("a.v", "b.v") / (F.col("a.nrm") * F.col("b.nrm"))
    dup_ids = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(cos >= 0.45)
        .select(F.col("b.vec_id").alias("vec_id"))
    )
    return e.join(dup_ids, "vec_id", "left_anti").select("vec_id", "label")


def _hyperplanes(dim: int = 64, n: int = N_HYPERPLANES) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed) baked into the
    plan as literals — every executor sees identical planes with no
    broadcast variable or driver round-trip."""
    rng = np.random.default_rng(42)
    return rng.standard_normal((n, dim)).tolist()


@query("sim_topk_lsh", tags=("rows-only",))
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: random-hyperplane LSH bucket prefilter + exact
    re-rank inside the bucket.

    sign(v·h_i) bits pack into a bucket id; probes only compare
    against their own bucket (~|corpus|/2^n candidates). rows-only:
    approximate by construction (bucket boundaries cost recall).
    """
    e = load(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    planes = _hyperplanes()
    # bucket id = packed sign bits of v·h_i (SQL for the nested-lambda
    # plane iteration)
    plane_sql = ", ".join(
        "array(" + ", ".join(f"{x!r}D" for x in p) + ")" for p in planes
    )
    bucket = F.expr(
        f"""
        aggregate(
          zip_with(
            array({plane_sql}),
            sequence(0, {N_HYPERPLANES - 1}),
            (p, i) -> CASE WHEN {_DOT.format(a='v', b='p')} >= 0D
                      THEN shiftleft(1, i) ELSE 0 END
          ),
          0, (acc, x) -> acc + x
        )
        """
    )
    bucketed = e.select("vec_id", "label", "v", bucket.alias("bucket"))
    probes = bucketed.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("bucket").alias("pbucket"),
    )
    scored = (
        F.broadcast(probes)
        .join(
            bucketed,
            (F.col("bucket") == F.col("pbucket"))
            & (F.col("vec_id") != F.col("probe_id")),
        )
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_expr("pv", "v").alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("probe_id", "neighbor_id", "cosine")
        .orderBy("probe_id", "neighbor_id")
    )
