"""Structured Streaming operators.

New scope relative to the reference (which has no streaming subsystem
— SURVEY.md notes only an async index-event channel): the driver's
``events`` table is the stream surface.  Batch and streaming share
the same declarative transformations, so every windowed operator here
has a batch twin used by the correctness oracles.
"""

from samyama_graph_spark.streaming.windows import (
    events_stream,
    hourly_windows,
    session_windows,
    sliding_windows,
    stateful_running_totals,
)

__all__ = [
    "events_stream",
    "hourly_windows",
    "sliding_windows",
    "session_windows",
    "stateful_running_totals",
]
