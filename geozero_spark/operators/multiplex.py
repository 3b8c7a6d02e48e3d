"""Shared-scan fan-out — the reference's Multiplexer
(geozero/src/multiplex.rs:7-191: one event stream duplicated to two
processors) re-expressed as one cached scan feeding N sinks.

The reference's point is to avoid re-reading/re-parsing the source when
two outputs are wanted; in Spark that's `persist()` + N actions — the
decode (the expensive pass) runs once, each sink streams from the
cache. ``unpersist`` after the last sink returns.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame


def multiplex(df: DataFrame,
              sinks: Sequence[Callable[[DataFrame], object]],
              eager: bool = True) -> list:
    """Run every sink callable against the SAME materialized DataFrame.

    Returns the sinks' return values. ``eager`` forces materialization
    before the first sink so sink latencies are cache-reads only.
    """
    cached = df.persist()
    try:
        if eager:
            cached.count()
        return [sink(cached) for sink in sinks]
    finally:
        cached.unpersist()
