"""Relational operator surface (SURVEY.md §2.1–§2.7 + as-of)."""

from . import aggregates, analytics, asof, etl, filters, graph, joins, scans, setops, windows  # noqa: F401
