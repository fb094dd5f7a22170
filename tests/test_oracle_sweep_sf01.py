"""Full-registry oracle sweep at sf0.1 — the bench scale factor.

Opt-in (`pytest -m sf01`, deselected by default via pytest.ini): the
default sweep (test_oracle_sweep.py) runs at the driver's sf0.01; this
one reproduces the "full registry green at sf0.1" claim on demand
instead of leaving it archaeological in a commit message. Run it
before each bench snapshot.
"""

from __future__ import annotations

import pytest

from uchr_scetl_spark import load_registry

from .conftest import SF_FULL
from .oracle import compare, oracle_connection

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def oracle_con_sf01():
    con = oracle_connection(SF_FULL)
    yield con
    con.close()


@pytest.mark.sf01
@pytest.mark.parametrize("key", sorted(REGISTRY))
def test_query_matches_oracle_at_sf01(key, spark, oracle_con_sf01):
    spec = REGISTRY[key]
    sdf = spec.fn(spark, SF_FULL).toPandas()
    if spec.rows_only:
        assert sdf is not None
        return
    odf = oracle_con_sf01.sql(spec.oracle).df()
    problems = compare(sdf, odf)
    assert not problems, f"{key}: {'; '.join(problems)}"
