"""Structured Streaming surface: sources, CDC pipelines, windowed and
stateful operators (SURVEY.md §2.A A1-A4, §2.C streaming-only; reference
entry points §3.1-3.2)."""

from . import pipeline, sources, windows  # noqa: F401
