"""Structured Streaming surface of the CDC engine."""
