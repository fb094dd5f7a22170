"""Streaming operators (§2.10): batch-checkable forms + Structured
Streaming mirrors."""

from . import batch  # noqa: F401
