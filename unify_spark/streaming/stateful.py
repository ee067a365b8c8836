"""Stateful streaming operators: watermark-bounded dedup and a custom
stateful aggregator (applyInPandasWithState).

The reference is batch-only (SURVEY §2.9); these are the Spark-native
operators a continuously-ingesting validation deployment needs:

- ``dedup_stream``: uniqueness enforcement at ingest —
  ``dropDuplicatesWithinWatermark`` keeps per-key state only inside the
  lateness window, so state is bounded regardless of stream length (the
  10^12-row answer to "streaming uniqueness"; historical dedup stays a batch
  reconciliation over the table).
- ``running_violation_counts``: applyInPandasWithState keeping a running
  (n_rows, n_violations) per group across micro-batches — the streaming
  analogue of the audit table's per-partition metrics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    event_time_col: str,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate keys arriving within the watermark window. State per
    key is dropped once the watermark passes — bounded memory."""
    return stream.withWatermark(event_time_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )


_STATE_SCHEMA = "n_rows long, n_violations long"
_OUT_SCHEMA = "part string, n_rows long, n_violations long"


def running_violation_counts(
    stream: DataFrame,
    violation_flag_col: str,
    group_col: str = "part_date",
) -> DataFrame:
    """Custom stateful operator: per group, a running total of rows and
    violating rows across ALL micro-batches seen so far (state = two longs
    per group). Input must carry a boolean ``violation_flag_col``."""
    slim = stream.select(
        F.col(group_col).alias("part"),
        F.col(violation_flag_col).cast("long").alias("is_bad"),
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n_rows, n_bad = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n_rows += len(pdf)
            n_bad += int(pdf["is_bad"].sum())
        state.update((n_rows, n_bad))
        yield pd.DataFrame(
            {"part": [key[0]], "n_rows": [n_rows], "n_violations": [n_bad]}
        )

    return slim.groupBy("part").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
