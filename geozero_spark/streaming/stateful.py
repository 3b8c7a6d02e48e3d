"""Custom stateful streaming operator: incremental key statistics via
applyInPandasWithState.

The reference has no streaming surface (SURVEY §1.3: all sources are
finite files/cursors); this is the engine-side operator the north rule's
streaming ingest needs — deduplication state that survives micro-batches
(e.g. first-seen tracking for a crawl feed). State per key is
order-independent (count + min key id) so results are deterministic
regardless of micro-batch slicing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "key string, n_docs long, min_doc_id long"
STATE_SCHEMA = "n_docs long, min_doc_id long"


def _update(key, pdfs, state: GroupState):
    n = 0
    mn = None
    for pdf in pdfs:
        n += len(pdf)
        m = int(pdf["doc_id"].min()) if len(pdf) else None
        if m is not None:
            mn = m if mn is None else min(mn, m)
    if state.exists:
        pn, pm = state.get
        n += pn
        mn = pm if mn is None else min(mn, pm)
    state.update((n, mn))
    yield pd.DataFrame({"key": [key[0]], "n_docs": [n],
                        "min_doc_id": [mn]})


def dedup_state_stream(stream_df, key_col: str = "key"):
    """stream of (key, doc_id) -> running (key, n_docs, min_doc_id);
    each micro-batch emits the UPDATED totals for touched keys."""
    return (stream_df
            .groupBy(key_col)
            .applyInPandasWithState(
                _update, OUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))
