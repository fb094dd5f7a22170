"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``uchr_scetl_spark`` package; this module
only adapts the central registry to the driver's three-function shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from uchr_scetl_spark import configure, load_registry  # noqa: E402
from uchr_scetl_spark.flagship import flagship  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure(spark)
    return flagship(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {key: spec.fn for key, spec in sorted(load_registry().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible key in ``queries()``."""
    return {
        key: spec.oracle
        for key, spec in sorted(load_registry().items())
        if spec.oracle is not None
    }
