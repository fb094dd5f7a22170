"""Duplicate-vec_id gate: the embeddings twin of the duplicate-doc_id
contract (tests/test_duplicate_docid_corpus.py).

Round-9 finding: on a corpus where every 19th vec_id appears twice
with a DIFFERENT vector (a re-run encoder job re-emitting ids — the
same at-least-once class as duplicated events/doc_ids), the
full-registry sweep split 4 keys: dedup_embedding, sim_kmeans_assign,
sim_knn_classify, sim_pairwise_threshold. Root cause is semantic —
pairwise keys order candidates by vec_id (two variants of one id are
unorderable), and per-id grouping merges two different vectors.

Committed contract: vec_id is a KEY column; violating input goes
through ``dedup_vec_ids`` first (deterministic struct-MIN survivor
per id — array<float> compares element-wise identically on both
engines). This gate proves the two-step pipeline end-to-end: the
dedup key is hash-exact ON the violating corpus, the 4 divergent keys
are hash-exact again on its output (rebuilt by the ORACLE SQL via
DuckDB COPY so the deduped parquet keeps the exact FLOAT[] physical
type), and one representative raw-input divergence stays pinned as a
tripwire.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from uchr_scetl_spark import clear_caches, load_registry
from uchr_scetl_spark.llm.dedup import DEDUP_VEC_SURVIVOR_SQL

from .conftest import SF_SMOKE
from .oracle import compare, oracle_connection

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DIVERGED_KEYS = [
    "dedup_embedding",
    "sim_kmeans_assign",
    "sim_knn_classify",
    "sim_pairwise_threshold",
]

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def dup_vec_dir():
    import duckdb

    out = tempfile.mkdtemp(prefix="uchr_dup_vecid_corpus_")
    con = duckdb.connect()
    for t in TABLES:
        src = f"{SF_SMOKE}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if t == "embeddings":
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{src}')
                  UNION ALL
                  SELECT vec_id,
                         list_transform(embedding,
                           x -> CAST(x * 0.5 + 0.01 AS FLOAT)) AS embedding,
                         label
                  FROM read_parquet('{src}') WHERE vec_id % 19 = 0
                ) TO '{dst}' (FORMAT PARQUET)
                """
            )
        else:
            shutil.copyfile(src, dst)
    con.close()
    yield out
    clear_caches(out)
    shutil.rmtree(out, ignore_errors=True)


@pytest.fixture(scope="module")
def deduped_dir(dup_vec_dir):
    """The documented remediation, materialised via the key's raw
    survivor SQL (the checked oracle wraps the same relation — the
    checked output renders the embedding as a scalar, but the
    remediation needs the exact FLOAT[] physical type, hence the
    split constant)."""
    import duckdb

    out = tempfile.mkdtemp(prefix="uchr_deduped_vecid_corpus_")
    for t in TABLES:
        if t != "embeddings":
            shutil.copyfile(f"{dup_vec_dir}/{t}.parquet", f"{out}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{dup_vec_dir}/embeddings.parquet')"
    )
    con.execute(
        f"COPY ({DEDUP_VEC_SURVIVOR_SQL}) "
        f"TO '{out}/embeddings.parquet' (FORMAT PARQUET)"
    )
    con.close()
    yield out
    clear_caches(out)
    shutil.rmtree(out, ignore_errors=True)


def test_corpus_violates_the_id_contract(dup_vec_dir):
    con = oracle_connection(dup_vec_dir)
    try:
        n, d = con.sql(
            "SELECT COUNT(*), COUNT(DISTINCT vec_id) FROM embeddings"
        ).fetchone()
        assert n > d, (n, d)
    finally:
        con.close()


def test_dedup_vec_ids_is_exact_on_the_violating_corpus(spark, dup_vec_dir):
    con = oracle_connection(dup_vec_dir)
    try:
        spec = REGISTRY["dedup_vec_ids"]
        sdf = spec.fn(spark, dup_vec_dir).toPandas()
        odf = con.sql(spec.oracle).df()
        problems = compare(sdf, odf)
        assert not problems, "; ".join(problems)
        assert sdf["vec_id"].is_unique
    finally:
        con.close()


def test_raw_dup_ids_stay_outside_the_per_key_contract(spark, dup_vec_dir):
    """Tripwire (the dup-doc_id gate pattern): sim_pairwise_threshold
    on RAW dup-id input diverges today. If this stops failing, the
    contract boundary moved — revisit the gate."""
    con = oracle_connection(dup_vec_dir)
    try:
        spec = REGISTRY["sim_pairwise_threshold"]
        sdf = spec.fn(spark, dup_vec_dir).toPandas()
        odf = con.sql(spec.oracle).df()
        assert compare(sdf, odf), "raw dup-id input unexpectedly agrees"
    finally:
        con.close()


@pytest.mark.parametrize("key", DIVERGED_KEYS)
def test_key_is_exact_again_after_id_dedup(key, spark, deduped_dir):
    con = oracle_connection(deduped_dir)
    try:
        spec = REGISTRY[key]
        sdf = spec.fn(spark, deduped_dir).toPandas()
        odf = con.sql(spec.oracle).df()
        problems = compare(sdf, odf)
        assert not problems, f"{key}: {'; '.join(problems)}"
    finally:
        con.close()
