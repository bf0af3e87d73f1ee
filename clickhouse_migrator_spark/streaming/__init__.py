"""Structured Streaming mirrors of the batch event-time operators
(SURVEY.md §7 M5)."""

from . import events_stream  # noqa: F401
