"""Composed analytical plans: TPC-H-shaped multi-operator pipelines."""

from . import sqltext, tpch  # noqa: F401
