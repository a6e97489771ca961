"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.9 engine-adds; north-star "custom stateful operators").

running_user_totals keeps one state row per user_id — (events_seen,
value_sum) — and emits the updated totals on every trigger. This is
what the reference's running throughput counters
(code/embeddingsWithGPU.py:230-247) look like when the counting
moves into the engine: keyed state, watermark-governed, restart-safe
via the checkpoint.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, events_seen bigint, value_sum double"
STATE_SCHEMA = "events_seen bigint, value_sum double"


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        seen, total = state.get
    else:
        seen, total = 0, 0.0
    for pdf in pdfs:
        seen += len(pdf)
        total += float(pdf["value"].sum())
    state.update((seen, total))
    yield pd.DataFrame([(user_id, seen, round(total, 4))],
                       columns=["user_id", "events_seen", "value_sum"])


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming frame → per-user running (count, sum) via keyed
    state. Update-mode output: one row per touched user per trigger."""
    return (events.groupBy("user_id")
            .applyInPandasWithState(
                _update,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
