"""Structured Streaming facade over the wave engine (SURVEY.md §1.2, C8)."""
