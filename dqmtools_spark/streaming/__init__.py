"""Structured Streaming wrapper around the batch pipeline."""
