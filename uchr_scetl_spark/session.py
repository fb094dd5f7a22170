"""SparkSession configuration for the engine.

Every query entry point calls :func:`configure` so the engine behaves
identically whether it runs in its own session (tests, bench) or in a
session handed to it by an external driver.

Config rationale (SURVEY.md §4.2):

- ``spark.sql.session.timeZone=UTC`` — the corpus stores naive
  (NTZ / isAdjustedToUTC=false) parquet timestamps; pinning UTC makes
  every timestamp function agree with a UTC-naive oracle engine.
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — ``events.ts`` is
  physical INT64 TIMESTAMP(NANOS) which Spark otherwise refuses to
  read; we read it as raw nanos and convert (see io.py).
- AQE on — runtime partition coalescing + skew-join splitting is the
  100 TB safety net for every shuffle this engine emits.
- shuffle partitions ≈ cores for local/bench scale. On a real cluster
  this is overridden by the operator (or left to AQE's coalescing with
  a high initial number); the engine never hard-codes a huge value.
- Arrow on — all pandas-UDF paths batch through Arrow.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe to (re-)apply at runtime on someone else's session.
_RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return max(4, os.cpu_count() or 4)


def configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an existing session (idempotent)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf not settable on this build
            pass
    try:
        # only set if it still has Spark's default; respect an explicit choice
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
    except Exception:  # pragma: no cover
        pass
    return spark


def get_session(app_name: str = "uchr-scetl-spark") -> SparkSession:
    """Build the engine's own session (tests / bench / CLI use)."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return configure(builder.getOrCreate())
