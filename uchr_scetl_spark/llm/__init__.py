"""LLM-data-pipeline operators (§2.9)."""
