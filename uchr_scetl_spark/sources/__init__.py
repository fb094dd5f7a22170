"""Custom data sources: engine-native connectors beyond the built-in
file formats, written against Spark 4's public Python DataSource API
(``pyspark.sql.datasource``) so they plug into the planner like any
DSv2 source — schema declaration, partition planning on the driver,
per-partition reads on executors."""

from . import synthetic  # noqa: F401
