"""Custom stateful streaming operator: per-user session tracking.

The batch twin (lag + gap-sum, ``__spark_entry__.q_events_sessions``) is
oracle-checked; this is the streaming form via
``applyInPandasWithState`` — Spark's arbitrary-stateful-processing hook
(SURVEY.md §7 phase E; the reference has no streaming at all, §2.9).

State per user: (last_ts_epoch_sec, n_sessions, n_events). A new session
starts when the gap since the previous event exceeds ``gap_sec``. Each
micro-batch emits the user's updated running totals.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("n_sessions", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
])

STATE_SCHEMA = T.StructType([
    T.StructField("last_ts", T.DoubleType(), True),
    T.StructField("n_sessions", T.LongType(), True),
    T.StructField("n_events", T.LongType(), True),
])


def track_sessions(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Streaming per-user session/event totals.

    Within a micro-batch rows are sorted by event time before folding into
    state, so a single-batch replay reproduces the batch sessionization
    exactly; across batches the state carries the last event time forward.
    """

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        for pdf in pdfs:
            # dropna (the stateful.py value-fold convention): one NULL
            # event timestamp becomes NaT, and NaT.timestamp() raises —
            # killing the whole streaming query for one bad row
            ts = pdf["ts"].dropna().sort_values()
            for t in ts:
                epoch = t.timestamp()
                if last_ts is None or epoch - last_ts > gap_sec:
                    n_sessions += 1
                n_events += 1
                last_ts = epoch
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame({"user_id": [user_id],
                            "n_sessions": [n_sessions],
                            "n_events": [n_events]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(fold, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))
