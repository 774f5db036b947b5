"""Streaming / incremental operators (SURVEY.md §2.9) — the reference's core
competency (watermark-incremental dump, ordered replay, divergence ladder)
plus event-time windowed analytics.

``batch_ops`` holds the batch-incremental forms (the reference itself is
run-per-invocation batch, ``availableNow`` semantics); ``structured`` holds
the genuine Structured Streaming pipelines used by the repl engine and the
streaming tests.
"""
