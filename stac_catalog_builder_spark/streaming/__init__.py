"""Structured Streaming analogues of the batch pipeline stages."""
