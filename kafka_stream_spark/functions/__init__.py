"""Scalar/function helpers (SURVEY.md §2.8): time, text, vectors, codecs."""
