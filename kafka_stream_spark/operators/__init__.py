"""Operator library (SURVEY.md §2): relational core, windows, dedup,
similarity, text analysis, multimodal plumbing."""
