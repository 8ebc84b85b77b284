"""Structured Streaming jobs (SURVEY §2.9).

The reference is scheduled micro-batch (nightly Pub/Sub -> Cloud
Function); the engine expresses that as Trigger.AvailableNow over a
file-queue source, plus the genuinely-streaming operators (watermarked
tumbling windows, session windows, streaming dedup, custom state) the
north star asks for.
"""
