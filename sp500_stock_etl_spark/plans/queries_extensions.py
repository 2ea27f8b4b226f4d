"""Deliberate extensions beyond the reference surface (SURVEY.md §7.3):
joins, grouped aggregation/rollup/cube, ranking windows, set ops,
JSON/date functions. Populated incrementally."""

from __future__ import annotations
