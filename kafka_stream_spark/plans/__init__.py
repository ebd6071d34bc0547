"""Declarative surfaces: KCQL-subset parser and pipeline specs (SURVEY.md §2.3 P1, §3.2)."""
