"""ANN scale-path operators: structural invariants + recall floors
against the exact brute-force baseline at sf0.001."""

from __future__ import annotations

import pytest

from uchr_scetl_spark import load_registry

from .conftest import SF_ORACLE

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def exact_topk(spark):
    rows = REGISTRY["sim_topk"].fn(spark, SF_ORACLE).collect()
    return {(r.probe_id, r.neighbor_id) for r in rows}


@pytest.mark.parametrize("key", ["sim_topk_ivf", "sim_topk_lsh"])
def test_ann_structure(key, spark, exact_topk):
    from uchr_scetl_spark.llm.similarity import N_PROBES, TOP_K

    rows = REGISTRY[key].fn(spark, SF_ORACLE).collect()
    per_probe: dict[int, int] = {}
    for r in rows:
        assert r.neighbor_id != r.probe_id
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9
        per_probe[r.probe_id] = per_probe.get(r.probe_id, 0) + 1
    assert set(per_probe) <= set(range(N_PROBES))
    assert all(n <= TOP_K for n in per_probe.values())
    # ANN may miss true neighbours, but on this corpus both variants
    # recover at least half of the exact top-k (IVF measures 0.87,
    # deterministic pipeline → stable value).
    found = {(r.probe_id, r.neighbor_id) for r in rows}
    assert len(exact_topk & found) / len(exact_topk) >= 0.5


def test_ivf_deterministic(spark):
    a = sorted(map(tuple, REGISTRY["sim_topk_ivf"].fn(spark, SF_ORACLE).collect()))
    b = sorted(map(tuple, REGISTRY["sim_topk_ivf"].fn(spark, SF_ORACLE).collect()))
    assert a == b
