"""Document deduplication operators (placeholder — exact, MinHash+LSH,
SimHash, n-gram Jaccard)."""

from __future__ import annotations

QUERIES: dict = {}
