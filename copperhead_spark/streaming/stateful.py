"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9 / build-plan step 8: the escape hatch when built-in
windows can't express the state machine).

Demonstrator: per-user running profile (event count, value sum in
fixed-point, last-seen timestamp) maintained as explicit state across
micro-batches.  On a finite replayed source the final emission must
equal the batch groupBy — which the test asserts, the same
streaming-vs-batch oracle discipline as plans/streaming.py."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def user_profile_stream(events: DataFrame) -> DataFrame:
    """events stream -> one row per user per micro-batch with the
    accumulated (n_events, value_sum_scaled, last_ts_us)."""

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, vsum, last = state.get
        else:
            n, vsum, last = 0, 0, 0
        for pdf in batches:
            n += len(pdf)
            # fixed-point per ROW (not per batch): bit-equal to the SQL
            # sum(round(value*1e4)) regardless of batching.  Rounding is
            # half-AWAY-from-zero to match SQL ROUND (pandas .round() is
            # half-even and would disagree on exact .5 scaled values).
            v = pdf["value"].to_numpy() * 10000.0
            vsum += int(np.copysign(np.floor(np.abs(v) + 0.5), v).astype("int64").sum())
            last = max(last, int(pdf["ts"].astype("int64").max() // 1000))
        state.update((n, vsum, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_sum_scaled": [vsum],
                "last_ts_us": [last],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, value_sum_scaled long, last_ts_us long",
        stateStructType="n long, vsum long, last long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
