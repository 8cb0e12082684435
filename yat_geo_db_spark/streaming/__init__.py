"""Structured Streaming layer (no reference analog — SURVEY.md §2.7)."""
