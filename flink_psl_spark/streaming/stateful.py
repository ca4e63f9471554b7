"""Custom stateful streaming operators (reference §2.9 keyed state + timers).

Built on ``applyInPandasWithState`` (GroupState + timeouts) — the Spark
analogue of the reference's KeyedProcessFunction with ValueState/ListState
and timers (flink-core/.../api/common/state/, KeyedStream.process).

``keyed_top_n`` is the streaming Top-N operator (reference:
StreamExecRank.java:83, AppendOnlyTopNFunction.java:52): it maintains a
bounded per-key buffer of the current top-n rows and emits the full refreshed
top-n of every key that changed in a micro-batch — an upsert stream keyed by
(key, rank), the same contract the reference's retract/upsert rank emits.

State size is O(keys × n × payload) — bounded by construction (the buffer
never exceeds n rows/key), which is what makes it safe at 100 TB key
cardinalities; the state store (RocksDB) spills to disk.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def keyed_top_n(
    events: DataFrame,
    key_col: str,
    order_col: str,
    n: int,
    *,
    payload_cols: list[str] | None = None,
    descending: bool = True,
) -> DataFrame:
    """Streaming Top-N per key over an append stream.

    Returns an update stream with schema
    (key, rank, order_value, *payload) — each micro-batch re-emits the
    refreshed top-n for keys whose top-n changed.
    """
    payload_cols = payload_cols or []
    in_cols = [key_col, order_col, *payload_cols]
    src = events.select(*in_cols)

    out_fields = ", ".join(
        [f"{key_col} {_dt(src, key_col)}", "rank int",
         f"{order_col} {_dt(src, order_col)}"]
        + [f"{c} {_dt(src, c)}" for c in payload_cols]
    )
    state_fields = ", ".join(
        [f"{order_col} array<{_dt(src, order_col)}>"]
        + [f"{c} array<{_dt(src, c)}>" for c in payload_cols]
    )

    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            stored = state.get
            buf = pd.DataFrame(
                {order_col: list(stored[0]),
                 **{c: list(stored[i + 1]) for i, c in enumerate(payload_cols)}}
            )
        else:
            buf = pd.DataFrame({order_col: [], **{c: [] for c in payload_cols}})
        new = pd.concat([buf] + [b[[order_col, *payload_cols]] for b in batches])
        new = new.sort_values(
            order_col, ascending=not descending, kind="mergesort"
        ).head(n)
        changed = len(new) != len(buf) or not new.reset_index(drop=True).equals(
            buf.reset_index(drop=True)
        )
        state.update(
            (new[order_col].tolist(),
             *[new[c].tolist() for c in payload_cols])
        )
        if changed:
            out = new.reset_index(drop=True)
            out.insert(0, "rank", range(1, len(out) + 1))
            out.insert(0, key_col, key[0])
            yield out
        else:
            yield pd.DataFrame(
                {key_col: [], "rank": [], order_col: [],
                 **{c: [] for c in payload_cols}}
            )

    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType=state_fields,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _dt(df: DataFrame, col: str) -> str:
    return dict(df.dtypes)[col]
