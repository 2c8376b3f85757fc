"""Structured Streaming jobs mirroring the batch event-time operators."""
