"""Spark DataFrame operators: extraction, dedup, similarity, text stats,
multimodal plumbing."""
