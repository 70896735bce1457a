"""Structured Streaming surface (SURVEY §1.3 + Spark-native extension).

The reference's only stream is a polled batch loop over table commits
(`api/.../spi/extractor/ExtractFromSource.java:34-51`); our engine keeps
that loop in ``onetable_spark.sync`` and adds a real streaming layer over
event data: file-source ``readStream``, watermarked tumbling/hopping
windows, and session windows — each with a batch twin that the DuckDB
oracle checks, so streaming results are verified against SQL semantics.
"""

from onetable_spark.streaming.events import (
    hopping_event_counts,
    read_event_stream,
    run_available_now,
    sessionize_stream,
    tumbling_event_counts,
)

__all__ = [
    "read_event_stream",
    "tumbling_event_counts",
    "hopping_event_counts",
    "sessionize_stream",
    "run_available_now",
]
