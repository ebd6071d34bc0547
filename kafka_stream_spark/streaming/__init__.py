"""Structured-Streaming layer (SURVEY.md §2.9, §7 M4): windowed aggs with
watermarks, stream joins, stateful dedup, pipeline registry."""
