"""Structured Streaming layer.

The reference has no streaming at all (SURVEY.md §2.9) — this is
Spark-native surface the rebuild adds: watermarked windowed aggregation
and stateful sessionization over the `events` stream, testable in batch
via availableNow triggers on file sources.
"""
