"""LLM-data-pipeline operators (§2.9)."""

from . import dedup, multimodal, sampling, similarity, text  # noqa: F401
