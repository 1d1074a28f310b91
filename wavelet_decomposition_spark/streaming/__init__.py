"""Structured Streaming facade over the 1m activity tier."""
