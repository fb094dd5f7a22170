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


def memo_clear(memo: MutableMapping[tuple, Any], sf_dir: str | None = None) -> None:
    """Unpersist and drop all entries, or one corpus dir's (sf_dir is
    index 1 of every memo key), under the shared lock."""
    with MEMO_LOCK:
        for k in list(memo):
            if sf_dir is None or k[1] == sf_dir:
                _drop(memo, k)
