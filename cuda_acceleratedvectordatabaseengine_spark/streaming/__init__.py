"""Structured Streaming surface: micro-batched search serving and
watermarked event-window aggregations."""
