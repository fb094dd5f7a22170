"""Composed analytical plans: TPC-H-shaped multi-operator pipelines."""

from . import tpch  # noqa: F401
