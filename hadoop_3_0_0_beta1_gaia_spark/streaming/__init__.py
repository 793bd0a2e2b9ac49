"""Structured Streaming surface.

The reference has NO streaming operators (SURVEY §2.11 — Hadoop "Streaming"
is a batch subprocess pipe). This package is the engine's forward-looking
stream path over the `events` table shape: file-source replay, watermarked
event-time windows, stateful aggregation — so the same query semantics run
batch or streaming.
"""
