"""Scalar function families (§2.8)."""

from . import scalars  # noqa: F401
