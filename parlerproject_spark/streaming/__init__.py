"""Structured Streaming surface (SURVEY §2.9).

The reference has no streaming system — its streaming-shaped
requirement is the pervasive checkpoint/resume discipline
(code/embeddings.py:32-44, ID_matching_metadata.py:25-30). Here that
becomes: file-source streams with exactly-once checkpointing,
event-time windows with watermarks, and the anti-join resume pattern
for batch incrementality.
"""
