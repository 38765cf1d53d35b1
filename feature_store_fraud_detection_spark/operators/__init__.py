"""Operator library: windows, relational serving queries, sampling, dedup,
similarity search, text analysis, multimodal plumbing."""
