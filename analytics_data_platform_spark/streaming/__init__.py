"""Structured Streaming layer.

The reference platform is batch-on-cron (SURVEY.md §2.10) — its incremental
machinery is watermark columns + table properties, which ``elt.runner``
reproduces. This module is the beyond-reference streaming surface: the same
operators (windowed aggregation, sessionization, dedup) expressed as
Structured Streaming queries so an events table can be maintained
continuously instead of per-cron-tick."""
