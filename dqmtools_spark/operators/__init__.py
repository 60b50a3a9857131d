"""Distributed operators: latest-per-key, group-mode, deterministic
sampling, deduplication, similarity search."""
