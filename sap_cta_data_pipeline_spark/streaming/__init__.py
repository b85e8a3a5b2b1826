"""Structured Streaming twins of the §2-K batch-declared operators."""
