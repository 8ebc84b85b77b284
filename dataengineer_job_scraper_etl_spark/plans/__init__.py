"""Assembled pipelines (the reference's entry points, SURVEY §3)."""
