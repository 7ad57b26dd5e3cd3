"""Multimodal (image/audio/video) column operators — Spark plumbing with
stubbed codecs (no media libraries exist in this container)."""
