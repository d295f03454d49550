"""Deduplication queries over the documents table (filled in M6)."""
