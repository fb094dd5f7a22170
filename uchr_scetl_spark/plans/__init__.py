"""Composed analytical plans: TPC-H-shaped multi-operator pipelines."""

from . import pipelines, sqltext, tpch  # noqa: F401
