"""Embedding similarity search operators (placeholder — brute-force
cosine top-k, LSH buckets)."""

from __future__ import annotations

QUERIES: dict = {}
