"""Duplicate-doc_id gate: what the engine guarantees when the
documents table violates its doc_id key contract (re-crawls and shard
overlaps re-emit an id with DIFFERENT text).

Round-9 finding: on a corpus where every 17th doc_id appears twice
with different texts, the full-registry sweep split 9 keys between
the engines — the whole shingle-index family (dedup_containment,
dedup_near, dedup_near_survivors, dedup_pair_jaccard_spectrum,
dedup_simhash) plus per-doc_id consumers (scan_binary_files' one-file-
per-id fixture, text_contamination_check, text_bigram_lm_score,
text_pack_sequences). The root cause is semantic, not a bug in either
engine: once two texts share one id, "a document" is ill-defined —
Spark's groupBy(doc_id) shingle sets merge the variants while the
oracle's per-row arrays keep them apart, and no spelling makes both
answers simultaneously right.

The committed contract (the stream_dedup precedent): doc_id is a KEY
column; raw violating input goes through ``dedup_doc_ids`` first — a
deterministic struct-MIN survivor per id (NULL fields smallest on
both engines), itself hash-exact on the violating corpus. This gate
proves the documented two-step pipeline end-to-end:

1. dedup_doc_ids value-matches the oracle ON the violating corpus;
2. rerunning the 9 divergent keys on its OUTPUT (one row per id
   again) restores hash-exactness for every one of them;
3. one representative raw-input divergence (dedup_near's pair count)
   is pinned as a tripwire so the contract's boundary stays visible —
   if an engine change ever makes raw dup-id input agree, this gate
   says so loudly and the contract should be revisited.
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

# the nine keys the raw dup-id corpus split, re-checked on the
# deduped output
DIVERGED_KEYS = [
    "dedup_containment",
    "dedup_near",
    "dedup_near_survivors",
    "dedup_pair_jaccard_spectrum",
    "dedup_simhash",
    "scan_binary_files",
    "text_contamination_check",
    "text_bigram_lm_score",
    "text_pack_sequences",
]

REGISTRY = load_registry()


def _build_dup_doc_corpus(out: str) -> None:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        src = f"{SF_SMOKE}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if t == "documents":
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{src}')
                  UNION ALL
                  SELECT doc_id,
                         'redelivered variant text of doc ' || doc_id ||
                         ' with different words entirely' AS text,
                         lang, source,
                         CAST(len('redelivered variant text of doc '
                                  || doc_id ||
                                  ' with different words entirely')
                              AS BIGINT) AS n_chars
                  FROM read_parquet('{src}') WHERE doc_id % 17 = 0
                ) TO '{dst}' (FORMAT PARQUET)
                """
            )
        else:
            shutil.copyfile(src, dst)
    con.close()


@pytest.fixture(scope="module")
def dup_doc_dir():
    out = tempfile.mkdtemp(prefix="uchr_dup_docid_corpus_")
    _build_dup_doc_corpus(out)
    yield out
    clear_caches(out)
    shutil.rmtree(out, ignore_errors=True)


@pytest.fixture(scope="module")
def deduped_dir(spark, dup_doc_dir):
    """The documented remediation: dedup_doc_ids' OUTPUT as the
    documents table, everything else copied through."""
    out = tempfile.mkdtemp(prefix="uchr_deduped_docid_corpus_")
    import pyarrow as pa
    import pyarrow.parquet as pq

    for t in TABLES:
        if t != "documents":
            shutil.copyfile(f"{dup_doc_dir}/{t}.parquet", f"{out}/{t}.parquet")
    # single parquet FILE (the corpus layout both engines read), not a
    # Spark part-file directory
    deduped = (
        REGISTRY["dedup_doc_ids"]
        .fn(spark, dup_doc_dir)
        .orderBy("doc_id")
        .toPandas()
    )
    pq.write_table(
        pa.Table.from_pandas(deduped, preserve_index=False),
        f"{out}/documents.parquet",
    )
    yield out
    clear_caches(out)
    shutil.rmtree(out, ignore_errors=True)


def test_corpus_violates_the_id_contract(dup_doc_dir):
    con = oracle_connection(dup_doc_dir)
    try:
        n, d = con.sql(
            "SELECT COUNT(*), COUNT(DISTINCT doc_id) FROM documents"
        ).fetchone()
        assert n > d, (n, d)
    finally:
        con.close()


def test_dedup_doc_ids_is_exact_on_the_violating_corpus(spark, dup_doc_dir):
    con = oracle_connection(dup_doc_dir)
    try:
        spec = REGISTRY["dedup_doc_ids"]
        sdf = spec.fn(spark, dup_doc_dir).toPandas()
        odf = con.sql(spec.oracle).df()
        problems = compare(sdf, odf)
        assert not problems, "; ".join(problems)
        assert sdf["doc_id"].is_unique
    finally:
        con.close()


def test_raw_dup_ids_stay_outside_the_per_key_contract(spark, dup_doc_dir):
    """Tripwire: dedup_near on RAW dup-id input diverges from the
    oracle today (merged vs per-row shingle sets — both defensible,
    neither 'the' answer). If this stops failing, the contract
    boundary moved; revisit the gate rather than letting it drift."""
    con = oracle_connection(dup_doc_dir)
    try:
        spec = REGISTRY["dedup_near"]
        sdf = spec.fn(spark, dup_doc_dir).toPandas()
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
