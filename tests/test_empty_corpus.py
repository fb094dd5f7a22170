"""Empty-input robustness: every registered operator must survive a
ZERO-ROW corpus — empty partitions, fresh tables, and filtered-to-
nothing date ranges are daily reality for a production engine, and
"crashes on empty input" is the classic operator bug class (schema
inference on empty writes, indexing into collected model state,
dividing by zero counts). Each key must return an empty-or-small
result with its normal schema, never raise."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from uchr_scetl_spark import load_registry

from .conftest import SF_SMOKE

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def empty_dir(spark):
    out = tempfile.mkdtemp(prefix="uchr_empty_corpus_")
    for t in TABLES:
        (
            spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
            .limit(0)
            .write.mode("overwrite")
            .parquet(f"{out}/{t}.parquet")
        )
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_every_key_survives_empty_corpus(spark, empty_dir):
    fails = []
    for key in sorted(REGISTRY):
        try:
            REGISTRY[key].fn(spark, empty_dir).limit(5).collect()
        except Exception as exc:  # noqa: BLE001 — collecting a report
            fails.append(f"{key}: {exc!r:.120}")
    assert not fails, "\n".join(fails)
