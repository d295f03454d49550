"""Similarity-search queries over the embeddings table (filled in M6)."""
