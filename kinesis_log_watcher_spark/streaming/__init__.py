"""Structured Streaming: windowed aggregation, watermarks, triggers.

The reference's streaming runtime (per-shard poll loops, backoff,
iterator renewal — main.go:217-396) is replaced wholesale by Spark's
micro-batch engine; this package holds what remains OURS to write:
event-time windowing (which the reference lacks entirely — it only knows
arrival time, main.go:265) and the trigger/checkpoint plumbing.
"""
