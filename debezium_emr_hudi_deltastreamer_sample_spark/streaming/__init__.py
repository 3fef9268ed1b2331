"""Structured Streaming surface: sources, CDC pipelines, windowed and
stateful operators, and the continuous-maintenance modules — incremental
view maintenance (ivm) and the additive rollup commit log (rollup)
(SURVEY.md §2.A A1-A4, §2.C streaming-only; reference entry points
§3.1-3.2)."""

from . import ivm, pipeline, rollup, sources, windows  # noqa: F401
