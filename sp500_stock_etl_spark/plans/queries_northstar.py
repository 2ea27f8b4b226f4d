"""North-star LLM-data-pipeline operators (BASELINE.json): dedup,
similarity search, text analysis, multimodal plumbing. Populated
incrementally."""

from __future__ import annotations
