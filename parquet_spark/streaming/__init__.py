"""Structured Streaming front-end for the encode engine."""
