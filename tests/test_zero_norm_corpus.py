"""Zero-norm-embedding gate (round-11 axis, self-initiated): a broken
encoder emitting ALL-ZERO vectors is the remaining embedding failure
shape after NULLs (round 6) and wrong dimensions (round 10). Cosine is
UNDEFINED on a zero-norm vector, and the raw sweep showed the engines
disagree on the failure mode in the worst possible way:

- **Spark ANSI double division RAISES DIVIDE_BY_ZERO** — one broken
  row killed seven similarity keys' whole jobs (sim_topk,
  sim_cosine_histogram, sim_knn_classify, sim_knn_classify_ann,
  sim_label_recall_topk, sim_topk_lsh, multimodal_crossmodal_topk);
- **DuckDB double division silently yields NULL** — the oracle
  answered with NULL cosines where Spark died.

Fix: the cosine-space admission predicate ``cos_conform`` /
``COS_CONFORM_SQL`` (model space + computable norm > 0 — the exact
denominator requirement, and the sum of squares both engines evaluate
identically, so admission is engine-exact). Dot-only keys (k-means
argmax, PQ distances, the gram matrix, label centroids) deliberately
stay on ``emb_conform`` — zero vectors are well-defined there and the
sweep proves them exact raw. Full-registry sweep on this corpus:
**306 pass / 0 fail / 3 rows-only.**
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from uchr_scetl_spark import clear_caches, load_registry

from .conftest import SF_SMOKE
from .oracle import compare, oracle_connection

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

REGISTRY = load_registry()

# the seven raisers (now admitted through cos_conform) + the two
# silent-drop cosine keys + the dot-only keys pinned exact on raw
# zero vectors
COSINE_KEYS = [
    "sim_topk",
    "sim_pairwise_threshold",
    "dedup_embedding",
    "sim_knn_classify",
    "sim_cosine_histogram",
    "sim_label_recall_topk",
    "multimodal_crossmodal_topk",
]
DOT_ONLY_KEYS = [
    "sim_kmeans_assign",
    "sim_label_centroids",
    "embeddings_gram_matrix",
    "embeddings_pq_assign",
    "sim_topk_pq",
    "embeddings_vector_qa",
    "embeddings_dim_conform",
]


@pytest.fixture(scope="module")
def zero_norm_dir():
    import duckdb

    out = tempfile.mkdtemp(prefix="uchr_zero_norm_corpus_")
    con = duckdb.connect()
    for t in TABLES:
        src = f"{SF_SMOKE}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if t == "embeddings":
            con.execute(
                f"""
                COPY (
                  SELECT vec_id,
                         CASE WHEN vec_id % 17 = 0
                              THEN CAST(list_transform(embedding,
                                     x -> CAST(0.0 AS FLOAT)) AS FLOAT[])
                              ELSE embedding END AS embedding,
                         label
                  FROM read_parquet('{src}')
                ) TO '{dst}' (FORMAT PARQUET)
                """
            )
        else:
            shutil.copyfile(src, dst)
    con.close()
    yield out
    clear_caches(out)
    shutil.rmtree(out, ignore_errors=True)


def test_corpus_carries_zero_vectors(zero_norm_dir):
    con = oracle_connection(zero_norm_dir)
    try:
        (n,) = con.sql(
            """
            SELECT count_if(list_dot_product(
                     CAST(embedding AS DOUBLE[]),
                     CAST(embedding AS DOUBLE[])) = 0)
            FROM embeddings WHERE embedding IS NOT NULL
            """
        ).fetchone()
        assert n > 0
    finally:
        con.close()


@pytest.mark.parametrize("key", COSINE_KEYS + DOT_ONLY_KEYS)
def test_key_is_exact_on_zero_norm_vectors(key, spark, zero_norm_dir):
    """Cosine keys quarantine zero-norm rows at admission (no engine
    ever divides by zero); dot-only keys process them raw — both
    value-matched end-to-end."""
    con = oracle_connection(zero_norm_dir)
    try:
        spec = REGISTRY[key]
        sdf = spec.fn(spark, zero_norm_dir).toPandas()
        odf = con.sql(spec.oracle).df()
        problems = compare(sdf, odf)
        assert not problems, f"{key}: {'; '.join(problems)}"
        assert len(sdf) > 0
    finally:
        con.close()


def test_division_by_zero_failure_modes_diverge(spark):
    """The tripwire that justifies the admission predicate: Spark
    ANSI double division by zero RAISES while DuckDB yields NULL —
    without cos_conform a single zero-norm vector kills the Spark job
    and the oracle silently answers."""
    import duckdb

    import pytest as _pytest

    with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        spark.sql("SELECT CAST(1.0 AS DOUBLE) / CAST(0.0 AS DOUBLE)").collect()

    con = duckdb.connect()
    try:
        (v,) = con.sql("SELECT 1.0::DOUBLE / 0.0::DOUBLE").fetchone()
    finally:
        con.close()
    assert v is None
