"""Synthetic deterministic data source via the Spark 4 Python
DataSource API.

This is the engine's "custom connector" surface: a source that is NOT
a file format, registered with ``spark.dataSource.register`` and read
through the ordinary ``spark.read.format(...).load()`` path. The
pattern generalises to any external system (REST pages, message
queues, bespoke binary feeds): the driver plans N ``InputPartition``s,
each executor materialises only its own slice, so throughput scales
with parallelism and nothing flows through the driver.

The concrete source here generates a keyed integer corpus from a pure
function of the row id (Knuth multiplicative hash), which makes it
- embarrassingly parallel: partition i generates rows [i*step, ...)
  with no coordination, the exact shape a 100 TB load-test or
  benchmark-data source needs;
- oracle-checkable: DuckDB reproduces the identical rows from
  ``range()`` with the same arithmetic, so the driver's value-hash
  comparison exercises the full read path (schema, partitions,
  iterator protocol) bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query

N_ROWS = 10_000
N_PARTS = 8
_KNUTH = 2654435761
_MOD = 1_000_003


def _datasource_class():
    # defined inside a factory so importing this module never pulls
    # pyspark.sql.datasource before a session exists
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _Reader(DataSourceReader):
        def __init__(self, n_rows: int, n_parts: int):
            self.n_rows = n_rows
            self.n_parts = n_parts

        def partitions(self):
            return [InputPartition(i) for i in range(self.n_parts)]

        def read(self, partition):
            # contiguous row-id slice per partition — no coordination,
            # no driver data path
            per = -(-self.n_rows // self.n_parts)
            lo = partition.value * per
            hi = min(lo + per, self.n_rows)
            for i in range(lo, hi):
                yield (i, i % self.n_parts, (i * _KNUTH) % _MOD)

    class SyntheticCorpus(DataSource):
        @classmethod
        def name(cls):
            return "uchr_synthetic_corpus"

        def schema(self):
            return "row_id bigint, shard int, score bigint"

        def reader(self, schema):
            return _Reader(
                int(self.options.get("n_rows", N_ROWS)),
                int(self.options.get("n_parts", N_PARTS)),
            )

    return SyntheticCorpus


@query(
    "scan_python_datasource",
    oracle=f"""
    SELECT CAST(i AS BIGINT) AS row_id,
           CAST(i % {N_PARTS} AS INT) AS shard,
           CAST((i * {_KNUTH}) % {_MOD} AS BIGINT) AS score
    FROM range({N_ROWS}) t(i)
    """,
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through a registered custom Python DataSource: the driver
    plans 8 InputPartitions, executors generate their slices via the
    Arrow-batched Python worker, and the result flows through the
    normal scan node (filters/projects compose on top like any
    source)."""
    spark.dataSource.register(_datasource_class())
    return spark.read.format("uchr_synthetic_corpus").load()
