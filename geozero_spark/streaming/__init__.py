"""Structured Streaming operators (stateful dedup, streaming cells)."""

from . import stateful  # noqa: F401
