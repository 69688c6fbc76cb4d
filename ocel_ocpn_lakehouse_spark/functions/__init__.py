"""Column-level function library: clustering keys, dedup, text, similarity."""
