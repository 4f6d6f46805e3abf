"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no event-time streaming at all (SURVEY §2 Part B: its
nearest analogue is the poll-based version updater,
elephantdb-server/src/clj/elephantdb/common/domain.clj:416-447, covered by
streaming/updater.py). This module adds the *custom state* path a training
data pipeline needs when the built-in windowed aggregations
(`F.window` / `F.session_window`, see analytics.py) can't express the
semantics: arbitrary per-key state carried across micro-batches with an
Arrow-batched pandas transition function.

`running_totals` is the canonical shape: per-key cumulative (count, sum)
emitted each micro-batch in update mode. State is one tiny row per key —
at 100 TB scale the state store shuffles by key once and holds O(keys), not
O(events); the transition function is vectorized per key-batch, never
per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    stream_df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (n_events, sum_value) across micro-batches.

    Input: a *streaming* DataFrame with ``key_col: long`` and
    ``value_col: double``. Output (update mode): one row per key per
    micro-batch with the cumulative totals so far.
    """

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return (
        stream_df.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            step,
            outputStructType=f"{key_col} long, n_events long, sum_value double",
            stateStructType="n long, s double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
