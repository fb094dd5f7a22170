"""Scalar function families (§2.8)."""
