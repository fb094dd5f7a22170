"""Central query registry.

Every operator the engine claims (SURVEY.md §2) registers exactly one
``QuerySpec``: a callable ``(spark, sf_dir) -> DataFrame`` plus — when
the semantics are ANSI-SQL-expressible — the DuckDB oracle SQL the
driver runs side-by-side. Keys without oracle SQL get the driver's
weaker rows-only check (approx sketches, LSH internals, map ordering).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    key: str
    fn: QueryFn
    oracle: Optional[str] = None
    tags: tuple[str, ...] = field(default_factory=tuple)

    @property
    def rows_only(self) -> bool:
        return self.oracle is None


def query(key: str, oracle: Optional[str] = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query under ``key``."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        REGISTRY[key] = QuerySpec(key=key, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def load_registry() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return REGISTRY."""
    from . import operators  # noqa: F401
    from . import functions  # noqa: F401
    from . import llm  # noqa: F401
    from . import plans  # noqa: F401
    from . import sources  # noqa: F401
    from . import streaming  # noqa: F401
    from . import udfs  # noqa: F401

    return REGISTRY
