"""Structured Streaming variant of the extraction stage."""
