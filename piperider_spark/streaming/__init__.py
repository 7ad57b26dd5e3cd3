"""Structured Streaming surface: the quality filter as a continuous job."""
