"""clear_caches() contract: the per-session relation memos (shingles,
signatures, verified pairs, IVF base/centroids) must be evictable per
corpus dir, and a REWRITTEN corpus at the same path must be re-read
after eviction — the stale-cache hazard the eviction hook exists for
(a long-lived session re-generating a corpus dir would otherwise be
served relations of the old data forever)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from uchr_scetl_spark import clear_caches, load_registry
from uchr_scetl_spark.io import load
from uchr_scetl_spark.llm import dedup, similarity, text
from uchr_scetl_spark.operators import graph
from uchr_scetl_spark.plans import tpch

from .conftest import SF_SMOKE

REGISTRY = load_registry()

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture()
def mutable_corpus(spark):
    out = tempfile.mkdtemp(prefix="uchr_mutable_corpus_")
    for t in TABLES:
        spark.read.parquet(f"{SF_SMOKE}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    yield out
    clear_caches(out)
    shutil.rmtree(out, ignore_errors=True)


def _memo_entries(sf_dir: str) -> int:
    memos = (
        dedup._shingled_memo,
        dedup._signature_memo,
        dedup._pairs_memo,
        similarity._ivf_base_memo,
        similarity._ivf_centroids_memo,
        text._bpe_vocab_memo,
        graph._copurchase_memo,
        tpch._partsupp_memo,
    )
    return sum(1 for m in memos for k in m if k[1] == sf_dir)


def test_clear_caches_scoped_to_dir(spark, mutable_corpus):
    REGISTRY["dedup_near"].fn(spark, mutable_corpus).count()
    REGISTRY["sim_topk_ivf"].fn(spark, mutable_corpus).count()
    # the baseline smoke dir's memos (warm from other tests) must
    # survive a scoped clear of the mutable dir
    REGISTRY["dedup_near"].fn(spark, SF_SMOKE).count()
    assert _memo_entries(mutable_corpus) > 0
    before_other = _memo_entries(SF_SMOKE)
    clear_caches(mutable_corpus)
    assert _memo_entries(mutable_corpus) == 0
    assert _memo_entries(SF_SMOKE) == before_other


def test_rewritten_corpus_reread_after_clear(spark, mutable_corpus):
    n1 = REGISTRY["dedup_exact"].fn(spark, mutable_corpus).count()
    near1 = REGISTRY["dedup_near"].fn(spark, mutable_corpus).count()
    assert near1 > 0  # the smoke corpus carries constructed near-dups

    # rewrite documents to a tiny distinct corpus: every doc unique
    docs = (
        load(spark, SF_SMOKE, "documents")
        .limit(4)
        .withColumn(
            "text",
            F.concat(F.lit("unique document number "), F.col("doc_id").cast("string")),
        )
    )
    docs.write.mode("overwrite").parquet(f"{mutable_corpus}/documents.parquet")

    # WITHOUT eviction the memoized pair relation would still report
    # the old corpus's near-dups; after clear_caches the engine must
    # see the new 4-doc all-unique table
    clear_caches(mutable_corpus)
    assert REGISTRY["dedup_exact"].fn(spark, mutable_corpus).count() == 4 != n1
    assert REGISTRY["dedup_near"].fn(spark, mutable_corpus).count() == 0
    # the memoized BPE vocabulary (round 6) must also re-read: the
    # rewritten 4-doc corpus has a tiny vocab whose top merge differs
    # from the original corpus's
    stats = REGISTRY["text_bpe_apply_merges"].fn(spark, mutable_corpus).first()
    assert stats.n_vocab_words <= 8, stats


def test_partsupp_memo_shared_and_evicted(spark, mutable_corpus):
    """Round-15: the derived partsupp relation (full lineitem scan +
    (part, supplier) DISTINCT) is built once per (app, corpus dir) and
    shared by its five TPC-H consumers (Q2/Q9/Q11/Q16/Q20) instead of
    being re-derived inside each; clear_caches evicts it per dir — the
    same stale-cache contract as every other relation memo."""
    df1 = tpch._partsupp(spark, mutable_corpus)
    df2 = tpch._partsupp(spark, mutable_corpus)
    assert df1 is df2  # memo hit: the SAME cached relation object
    REGISTRY["tpch_q9"].fn(spark, mutable_corpus).count()
    assert any(k[1] == mutable_corpus for k in tpch._partsupp_memo)
    clear_caches(mutable_corpus)
    assert not any(k[1] == mutable_corpus for k in tpch._partsupp_memo)


def test_memo_get_is_race_free_and_prunes_dead_sessions(spark):
    """Round-5 advice: the bare check-then-insert could double-build
    under threads (leaking an InMemoryRelation), and stopped-session
    entries lived until process exit. memo_get must (a) build exactly
    once across concurrent callers and (b) drop entries whose
    applicationId is not the caller's."""
    import threading

    from uchr_scetl_spark.memo import memo_get

    memo: dict = {}
    app = spark.sparkContext.applicationId
    builds = []

    def build():
        builds.append(1)
        return spark.range(1).cache()

    threads = [
        threading.Thread(
            target=lambda: memo_get(memo, (app, "/tmp/x"), build)
        )
        for _ in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(builds) == 1
    assert list(memo) == [(app, "/tmp/x")]

    # a dead session's entry (different applicationId) prunes on access
    memo[("dead-app-id", "/tmp/y")] = spark.range(1)
    memo_get(memo, (app, "/tmp/x"), build)
    assert ("dead-app-id", "/tmp/y") not in memo
    assert len(builds) == 1


def test_memo_get_heavy_builds_outside_the_lock(spark):
    """Round-14 (r13 ADVICE): the graph family's edge-count size probe
    runs a distributed count() as its memo build; memo_get ran it
    while holding MEMO_LOCK, blocking every other memo user for the
    job's duration. memo_get_heavy must (a) run the build with
    MEMO_LOCK free (probed from a helper thread mid-build), (b) give
    every racer the first-stored value, and (c) prune dead-session
    entries like memo_get does."""
    import threading

    from uchr_scetl_spark.memo import MEMO_LOCK, memo_get_heavy

    memo: dict = {}
    app = spark.sparkContext.applicationId
    lock_free_during_build = []

    def build():
        # probe from ANOTHER thread: RLock re-entrancy would make an
        # in-thread acquire succeed even while this thread holds it
        got = []

        def probe():
            ok = MEMO_LOCK.acquire(timeout=5)
            if ok:
                MEMO_LOCK.release()
            got.append(ok)

        t = threading.Thread(target=probe)
        t.start()
        t.join()
        lock_free_during_build.append(got[0])
        return 42

    memo[("dead-app-id", "/tmp/y")] = 7
    assert memo_get_heavy(memo, (app, "/tmp/x"), build) == 42
    assert lock_free_during_build == [True]
    assert ("dead-app-id", "/tmp/y") not in memo

    # racers: all callers converge on the first-stored value even if
    # several builds run; the memo holds exactly one entry
    results = []
    threads = [
        threading.Thread(
            target=lambda: results.append(
                memo_get_heavy(memo, (app, "/tmp/z"), lambda: 99)
            )
        )
        for _ in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == [99] * 8
    assert memo[(app, "/tmp/z")] == 99
