"""Structured Streaming validation."""
