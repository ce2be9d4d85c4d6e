"""Reusable function-level building blocks (text, dedup, similarity,
multimodal) used by the registered queries, the streaming path, and bench."""
