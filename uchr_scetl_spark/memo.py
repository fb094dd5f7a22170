"""Lock-guarded session memoization for cached relations.

The per-session memo dicts (shingles / MinHash+SimHash signatures /
verified pairs in llm.dedup, IVF base+centroids in llm.similarity, the
weighted co-purchase edges in operators.graph) are plain module state.
Two hazards the bare check-then-insert had (round-5 advice):

1. **Races**: two threads can both miss the key and both build — one
   cached InMemoryRelation leaks with no reference to unpersist it.
   All get-or-create and clear paths now serialize on one re-entrant
   lock; builds are lazy (``.cache()`` returns immediately), so the
   critical section is cheap. The one exception is the IVF centroid
   build, which collects inside the lock — bounded (C×dim doubles, the
   documented collect exception) and correct: concurrent callers must
   not run duplicate k-means jobs anyway.

   Builds that run a DISTRIBUTED JOB for a plain value (the graph
   family's edge-count size probe) must NOT hold the lock for the
   job's duration — that would block every other memo user (dedup
   shingles, similarity IVF) behind one count (round-13 ADVICE).
   Those go through :func:`memo_get_heavy`, the double-checked
   variant: read under lock, build unlocked, first store wins.

2. **Dead-session entries**: memo keys lead with ``applicationId``
   precisely so a restarted session never reads a stale cache, but the
   old session's entries survived until process exit. ``memo_get`` now
   prunes any entry whose applicationId differs from the caller's —
   its session is stopped (or superseded), so the DataFrame can never
   be served again; unpersist is attempted best-effort (the JVM-side
   cache usually died with the session).

Every memo key is a tuple with applicationId at index 0 and sf_dir at
index 1 — both helpers rely on that layout.
"""

from __future__ import annotations

import threading
from typing import Any, Callable, MutableMapping

MEMO_LOCK = threading.RLock()


def _drop(memo: MutableMapping, key: tuple) -> None:
    val = memo.pop(key)
    try:
        val.unpersist()
    except Exception:
        # plain-value memos (centroid lists) have no unpersist; a
        # stopped session's DataFrame raises — both are fine to ignore
        pass


def memo_get(
    memo: MutableMapping[tuple, Any], key: tuple, build: Callable[[], Any]
) -> Any:
    """Get-or-create ``memo[key]`` under the shared lock, first
    pruning entries from other (stopped/superseded) applications."""
    app_id = key[0]
    with MEMO_LOCK:
        for k in list(memo):
            if k[0] != app_id:
                _drop(memo, k)
        if key not in memo:
            memo[key] = build()
        return memo[key]


def memo_get_heavy(
    memo: MutableMapping[tuple, Any], key: tuple, build: Callable[[], Any]
) -> Any:
    """Get-or-create for builds that run a distributed job (a count,
    a bounded collect) producing a PLAIN VALUE. Double-checked: the
    hit path and the store run under the shared lock, the build runs
    UNLOCKED, so a minutes-long job never blocks unrelated memo users.

    Contract differences from :func:`memo_get`:

    - concurrent misses may BOTH run the build; the first store wins
      and the loser's value is simply dropped — so builds must be
      deterministic and side-effect-free beyond their return value
      (true for counts over deterministic relations);
    - values must not need unpersist-on-drop (plain ints/lists, never
      a cached DataFrame: unpersisting a losing duplicate would evict
      the winner's cache entry too, since Spark keys the cache by
      logical plan). Cached relations stay with :func:`memo_get`,
      whose builds are lazy and cheap under the lock.
    """
    app_id = key[0]
    with MEMO_LOCK:
        for k in list(memo):
            if k[0] != app_id:
                _drop(memo, k)
        if key in memo:
            return memo[key]
    val = build()
    with MEMO_LOCK:
        if key not in memo:
            memo[key] = val
        return memo[key]


def memo_clear(memo: MutableMapping[tuple, Any], sf_dir: str | None = None) -> None:
    """Unpersist and drop all entries, or one corpus dir's (sf_dir is
    index 1 of every memo key), under the shared lock."""
    with MEMO_LOCK:
        for k in list(memo):
            if sf_dir is None or k[1] == sf_dir:
                _drop(memo, k)
