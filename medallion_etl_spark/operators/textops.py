"""Text analysis operators for training-data pipelines (placeholder —
filled in with lang-id, quality scoring, token counting, fingerprints)."""

from __future__ import annotations

QUERIES: dict = {}
