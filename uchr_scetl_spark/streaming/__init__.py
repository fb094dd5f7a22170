"""Streaming operators (§2.10)."""
