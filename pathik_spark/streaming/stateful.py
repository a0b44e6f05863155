"""Custom stateful streaming operators (SURVEY.md streaming surface;
north-rule politeness semantics expressed over a stream).

- ``streaming_seen_filter``: URL-seen dedup on a stream — Spark's
  built-in watermarked ``dropDuplicates`` on url_hash (state-store
  backed, the streaming twin of J3).
- ``stateful_host_budget``: per-host running budget enforcement with
  ``applyInPandasWithState`` — carries (count_so_far) per host across
  micro-batches and emits only rows within ``max_per_round``; the
  streaming twin of B4's budget cap.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_seen_filter(frontier_stream: DataFrame, watermark_col: str = "event_ts") -> DataFrame:
    """Watermarked streaming dedup by url_hash (exact within the
    watermark horizon; pair with the batch anti-join for full history)."""
    return frontier_stream.withWatermark(watermark_col, "1 hour").dropDuplicates(["url_hash"])


BUDGET_OUTPUT_SCHEMA = "host string, url string, url_hash long, n_admitted long"
BUDGET_STATE_SCHEMA = "n long"


def _budget_fn(max_per_host: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (host,) = key
        n = state.get[0] if state.exists else 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["url_hash"], kind="mergesort")
            room = max(0, max_per_host - n)
            take = pdf.head(room)
            n += len(take)
            if len(take):
                out.append(
                    pd.DataFrame(
                        {
                            "host": host,
                            "url": take["url"],
                            "url_hash": take["url_hash"],
                            "n_admitted": range(n - len(take) + 1, n + 1),
                        }
                    )
                )
        state.update((n,))
        for pdf in out:
            yield pdf

    return fn


def stateful_host_budget(frontier_stream: DataFrame, max_per_host: int = 10) -> DataFrame:
    """Admit at most ``max_per_host`` URLs per host across the whole
    stream (state persists across micro-batches)."""
    return (
        frontier_stream.groupBy("host")
        .applyInPandasWithState(
            _budget_fn(max_per_host),
            outputStructType=BUDGET_OUTPUT_SCHEMA,
            stateStructType=BUDGET_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
