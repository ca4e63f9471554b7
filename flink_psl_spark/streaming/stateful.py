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

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def keyed_top_n(
    events: DataFrame,
    key_col: str,
    order_col: str,
    n: int,
    *,
    payload_cols: list[str] | None = None,
    descending: bool = True,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming Top-N per key over an append stream.

    Returns an update stream with schema
    (key, rank, order_value, *payload) — each micro-batch re-emits the
    refreshed top-n for keys whose top-n changed.

    ``tiebreak_cols`` (a subset of ``payload_cols``, sorted ascending) make
    equal ``order_col`` values rank deterministically instead of by arrival
    order — required for cross-engine comparison of the final top-n.
    """
    payload_cols = payload_cols or []
    tiebreak_cols = tiebreak_cols or []
    if not set(tiebreak_cols) <= set(payload_cols):
        raise ValueError("tiebreak_cols must be a subset of payload_cols")
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
            [order_col, *tiebreak_cols],
            ascending=[not descending] + [True] * len(tiebreak_cols),
            kind="mergesort",
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


def keyed_running_agg(
    events: DataFrame,
    key_col: str,
    value_col: str,
    *,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running aggregate (cnt, sum, min, max) as an update stream —
    the reference's streaming group aggregation (StreamExecGroupAggregate
    .java:81, GroupAggFunction.java) with idle-state retention
    (``table.exec.state.ttl`` ≈ ``ttl_ms``, StateTtlConfig).

    Built on ``transformWithStateInPandas`` (Spark 4 stateful processor API)
    with a TTL'd ValueState — the engine-level counterpart of the PSL
    fork's pluggable keyed state (SURVEY §0): the state lives in the
    configured state-store provider (RocksDB here) and expires per key
    after ``ttl_ms`` of no updates.

    The transformWithState protocol needs the ``protobuf`` package; where
    it is absent the operator falls back to an equivalent
    ``applyInPandasWithState`` implementation (GroupState has no per-state
    TTL — ``ttl_ms`` is then ignored; production TTL uses the primary path
    or a GroupStateTimeout sweep).
    """
    src = events.select(key_col, value_col)
    k_dt = _dt(src, key_col)
    out_schema = (
        f"{key_col} {k_dt}, cnt bigint, total double, min_v double, max_v double"
    )

    try:
        import google.protobuf  # noqa: F401  (transformWithState transport)

        _tws_available = True
    except ImportError:
        _tws_available = False

    if not _tws_available:
        state_fields = "cnt bigint, total double, min_v double, max_v double"

        def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
            cnt, total, mn, mx = state.get if state.exists else (0, 0.0, None, None)
            for pdf in batches:
                v = pdf[value_col]
                if len(v):
                    cnt += len(v)
                    total += float(v.sum())
                    mn = float(v.min()) if mn is None else min(mn, float(v.min()))
                    mx = float(v.max()) if mx is None else max(mx, float(v.max()))
            state.update((cnt, total, mn, mx))
            yield pd.DataFrame(
                {key_col: [key[0]], "cnt": [cnt], "total": [total],
                 "min_v": [mn], "max_v": [mx]}
            )

        return src.groupBy(key_col).applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_fields,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningAgg(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "agg", "cnt bigint, total double, min_v double, max_v double",
                ttlDurationMs=ttl_ms,
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._st.exists():
                cnt, total, mn, mx = self._st.get()
            else:
                cnt, total, mn, mx = 0, 0.0, None, None
            for pdf in rows:
                v = pdf[value_col]
                cnt += len(v)
                total += float(v.sum())
                mn = float(v.min()) if mn is None else min(mn, float(v.min()))
                mx = float(v.max()) if mx is None else max(mx, float(v.max()))
            self._st.update((cnt, total, mn, mx))
            yield pd.DataFrame(
                {key_col: [key[0]], "cnt": [cnt], "total": [total],
                 "min_v": [mn], "max_v": [mx]}
            )

        def close(self) -> None:
            pass

    return src.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningAgg(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def connect_keyed(
    data: DataFrame,
    control: DataFrame,
    key_col: str,
    order_col: str,
    process: "Callable[[object, pd.DataFrame, dict], tuple[pd.DataFrame | None, dict]]",
    out_schema: str,
    state_schema: str = "state_json string",
) -> DataFrame:
    """connect / CoProcessFunction (reference: DataStream.connect:253,
    ConnectedStreams + broadcast state pattern; SURVEY §2.9 — Spark has no
    two-input operator, so the two streams are unioned with a discriminator
    column and processed by one stateful op).

    ``data`` and ``control`` must share ``key_col`` and ``order_col``; their
    remaining columns are carried in a JSON payload (schema-agnostic glue —
    typed fast paths should write a dedicated applyInPandasWithState op).

    ``process(key, rows, state_dict) -> (emit_df | None, new_state_dict)``
    sees each micro-batch's rows for one key, ordered by (order_col, side)
    with control rows first at equal timestamps — the reference's
    recommended control-priority convention. ``state_dict`` is an arbitrary
    JSON-serializable dict (≈ ValueState).
    """
    import json as _json

    d = data.select(
        F.col(key_col).alias("__k"),
        F.col(order_col).alias("__o"),
        F.lit(1).alias("__side"),
        F.to_json(F.struct(*[c for c in data.columns])).alias("__payload"),
    )
    c = control.select(
        F.col(key_col).alias("__k"),
        F.col(order_col).alias("__o"),
        F.lit(0).alias("__side"),
        F.to_json(F.struct(*[c for c in control.columns])).alias("__payload"),
    )
    unioned = d.unionByName(c)

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
        st = _json.loads(state.get[0]) if state.exists else {}
        for b in batches:
            b = b.sort_values(["__o", "__side"], kind="mergesort")
            rows = pd.DataFrame(
                {
                    "side": b["__side"].map({0: "control", 1: "data"}),
                    "order": b["__o"],
                    "payload": [_json.loads(p) for p in b["__payload"]],
                }
            )
            emit, st = process(key[0], rows, st)
            if emit is not None and len(emit):
                yield emit
        state.update((_json.dumps(st),))

    return unioned.groupBy("__k").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def keyed_count_window(
    events: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    size: int,
    *,
    evictor: tuple | None = None,
) -> DataFrame:
    """Count-based tumbling windows (reference:
    flink-streaming-java/.../windowing/assigners — countWindow(size) on
    KeyedStream; no Spark primitive, SURVEY §2.9 'count windows').

    Buffers rows per key; every ``size`` rows (in ``order_col`` order within
    the buffered prefix) emits one aggregate row (n, sum, min, max) and
    drops them from state. Incomplete tails stay in state across batches —
    state is bounded at ``size - 1`` rows per key.

    ``evictor`` applies the reference's pre-aggregation eviction inside
    each fired window (windowing/evictors/):

    - ``("count", m)`` — CountEvictor.of(m): keep only the LAST m elements;
    - ``("delta", thr)`` — DeltaEvictor.of(thr, delta): evict elements
      whose |value - last element's value| > thr.

    The window still fires on ``size`` buffered rows; eviction only shapes
    what the aggregate sees — exactly the reference contract (evictors run
    between trigger firing and the window function).

    Ordering contract: rows are processed in (arrival batch, order_col)
    order — the reference's processing-time count window; with a
    single-batch bounded replay this equals global event-time order.
    """
    if evictor is not None and evictor[0] not in ("count", "delta"):
        raise ValueError(f"unknown evictor {evictor[0]!r}")
    src = events.select(key_col, order_col, value_col)
    k_dt, o_dt, v_dt = (_dt(src, c) for c in (key_col, order_col, value_col))
    out_fields = (
        f"{key_col} {k_dt}, window_seq bigint, n int, "
        f"sum_v double, min_v double, max_v double"
    )
    state_fields = f"seq bigint, ord array<{o_dt}>, vals array<{v_dt}>"

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            seq, ords, vals = state.get
            buf = pd.DataFrame({order_col: list(ords), value_col: list(vals)})
        else:
            seq = 0
            buf = pd.DataFrame({order_col: [], value_col: []})
        outs = []
        for b in batches:
            b = b.sort_values(order_col, kind="mergesort")
            buf = pd.concat([buf, b[[order_col, value_col]]], ignore_index=True)
            while len(buf) >= size:
                win, buf = buf.iloc[:size], buf.iloc[size:]
                if evictor is not None:
                    kind, arg = evictor
                    if kind == "count":
                        win = win.iloc[-int(arg):]
                    else:  # delta vs the window's last element
                        last = win[value_col].iloc[-1]
                        win = win[(win[value_col] - last).abs() <= arg]
                outs.append(
                    {
                        key_col: key[0],
                        "window_seq": seq,
                        "n": len(win),
                        "sum_v": float(win[value_col].sum()),
                        "min_v": float(win[value_col].min()),
                        "max_v": float(win[value_col].max()),
                    }
                )
                seq += 1
        state.update(
            (seq, buf[order_col].tolist(), buf[value_col].tolist())
        )
        if outs:
            yield pd.DataFrame(outs)
        else:
            yield pd.DataFrame(
                {key_col: [], "window_seq": [], "n": [],
                 "sum_v": [], "min_v": [], "max_v": []}
            )

    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType=state_fields,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_rows_over(
    events: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    preceding: int,
    *,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming OVER aggregate, ROWS BETWEEN ``preceding`` PRECEDING AND
    CURRENT ROW (reference: StreamExecOverAggregate.java:91,
    ProcTimeRowsBoundedPrecedingFunction.java — Spark has no streaming
    OVER; SURVEY §2.5).

    Emits one row per input row with running (sum, avg, cnt) over the last
    ``preceding``+1 rows of the same key. State is exactly the last
    ``preceding`` (order, value) pairs per key — bounded by construction.

    Ordering contract: same as ``keyed_count_window`` (processing order
    within key; event-time order under single-batch replay — the
    reference's proc-time variant semantics).
    """
    payload_cols = payload_cols or []
    src = events.select(key_col, order_col, value_col, *payload_cols)
    k_dt, o_dt, v_dt = (_dt(src, c) for c in (key_col, order_col, value_col))
    pay_out = "".join(
        f", {c} {_dt(src, c)}" for c in payload_cols
    )
    out_fields = (
        f"{key_col} {k_dt}, {order_col} {o_dt}, {value_col} {v_dt}{pay_out}, "
        f"run_sum double, run_avg double, run_cnt int"
    )
    state_fields = f"ord array<{o_dt}>, vals array<{v_dt}>"

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            ords, vals = state.get
            tail = pd.DataFrame({order_col: list(ords), value_col: list(vals)})
        else:
            tail = pd.DataFrame({order_col: [], value_col: []})
        for b in batches:
            b = b.sort_values(order_col, kind="mergesort").reset_index(drop=True)
            hist = pd.concat(
                [tail, b[[order_col, value_col]]], ignore_index=True
            )
            n_tail = len(tail)
            out = b.copy()
            sums, avgs, cnts = [], [], []
            vals_np = hist[value_col].to_numpy()
            for i in range(len(b)):
                hi = n_tail + i + 1
                lo = max(0, hi - (preceding + 1))
                w = vals_np[lo:hi]
                sums.append(float(w.sum()))
                avgs.append(float(w.mean()))
                cnts.append(len(w))
            out["run_sum"] = sums
            out["run_avg"] = avgs
            out["run_cnt"] = cnts
            tail = hist.iloc[max(0, len(hist) - preceding):]
            yield out
        state.update((tail[order_col].tolist(), tail[value_col].tolist()))

    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType=state_fields,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_range_over(
    events: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    preceding: str,
    *,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming OVER aggregate, RANGE BETWEEN INTERVAL ``preceding``
    PRECEDING AND CURRENT ROW (reference: StreamExecOverAggregate.java:91,
    RowTimeRangeBoundedPrecedingFunction.java:55).

    Value-based frame: each output row aggregates every row of the same key
    whose ``order_col`` lies in [t - preceding, t] — including equal-time
    peers, matching SQL RANGE semantics (the reference fires per timestamp,
    emitting all peers together). State is the (order, value) tail within
    the trailing interval of the newest row — bounded by the time span ×
    per-key rate, exactly the reference's retained-rows contract.

    Ordering contract: same as ``streaming_rows_over`` (event-time order
    under single-batch replay; peers split across micro-batches join only
    forward).
    """
    payload_cols = payload_cols or []
    src = events.select(key_col, order_col, value_col, *payload_cols)
    k_dt, o_dt, v_dt = (_dt(src, c) for c in (key_col, order_col, value_col))
    pay_out = "".join(f", {c} {_dt(src, c)}" for c in payload_cols)
    out_fields = (
        f"{key_col} {k_dt}, {order_col} {o_dt}, {value_col} {v_dt}{pay_out}, "
        f"run_sum double, run_avg double, run_cnt int"
    )
    state_fields = f"ord array<{o_dt}>, vals array<{v_dt}>"
    delta = pd.Timedelta(preceding)

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
        import numpy as np

        if state.exists:
            ords, vals = state.get
            tail = pd.DataFrame({order_col: list(ords), value_col: list(vals)})
        else:
            tail = pd.DataFrame({order_col: [], value_col: []})
        for b in batches:
            b = b.sort_values(order_col, kind="mergesort").reset_index(drop=True)
            hist = (
                pd.concat([tail, b[[order_col, value_col]]], ignore_index=True)
                .sort_values(order_col, kind="mergesort")
                .reset_index(drop=True)
            )
            # empty/state-rehydrated tails arrive object-dtyped: normalize to
            # datetime64/float64 so searchsorted compares homogeneously
            ords_np = pd.to_datetime(hist[order_col]).to_numpy()
            vals_np = hist[value_col].to_numpy(dtype="float64")
            out = b.copy()
            sums, avgs, cnts = [], [], []
            b_ords = pd.to_datetime(b[order_col]).to_numpy()
            np_delta = np.timedelta64(delta)
            for t in b_ords:
                lo = np.searchsorted(ords_np, t - np_delta, side="left")
                hi = np.searchsorted(ords_np, t, side="right")
                w = vals_np[lo:hi]
                sums.append(float(w.sum()))
                avgs.append(float(w.mean()))
                cnts.append(int(hi - lo))
            out["run_sum"] = sums
            out["run_avg"] = avgs
            out["run_cnt"] = cnts
            cutoff = ords_np[-1] - np_delta if len(ords_np) else None
            tail = (
                hist[hist[order_col] >= cutoff]
                if cutoff is not None
                else hist
            )
            yield out
        state.update((tail[order_col].tolist(), tail[value_col].tolist()))

    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType=state_fields,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_event_time_sort(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    payload_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Event-time streaming sort (reference StreamExecTemporalSort.java:64,
    RowTimeSortOperator.java): buffer per key, emit rows in (ts, tiebreak)
    order once the watermark finalizes them — late rows can no longer land
    inside an emitted prefix. ``emit_seq`` numbers the emission order per
    key, making orderedness value-checkable downstream (an order-insensitive
    result compare still proves the sort via the sequence column).

    Input must be watermarked on ``ts_col``. State holds only unfinalized
    rows; event-time timeouts wake keys when the watermark passes their
    oldest buffered row (same trigger pattern as streaming CEP).
    """
    payload_cols = payload_cols or []
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    src = events.select(
        key_col, ts_col, *dict.fromkeys(payload_cols + ([tiebreak_col] if tiebreak_col else []))
    )
    k_dt = _dt(src, key_col)
    pay_cols = list(dict.fromkeys(payload_cols + ([tiebreak_col] if tiebreak_col else [])))
    pay_out = "".join(f", {c} {_dt(src, c)}" for c in pay_cols)
    out_fields = f"{key_col} {k_dt}, emit_seq bigint, {ts_col} {_dt(src, ts_col)}{pay_out}"
    out_names = [key_col, "emit_seq", ts_col, *pay_cols]
    # typed array state, NOT json: pandas read_json (ujson) parses doubles
    # with last-ulp error, which the exact value compare would catch
    state_fields = ", ".join(
        [f"{ts_col} array<bigint>"]
        + [f"{c} array<{_dt(src, c)}>" for c in pay_cols]
        + ["seq bigint"]
    )

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            stored = state.get
            buf = pd.DataFrame(
                {ts_col: list(stored[0]),
                 **{c: list(stored[i + 1]) for i, c in enumerate(pay_cols)}}
            )
            seq = stored[len(pay_cols) + 1]
        else:
            buf = pd.DataFrame()
            seq = 0
        new = [b for b in batches]
        if new:
            incoming = pd.concat(new, ignore_index=True)
            incoming = incoming.drop(columns=[key_col])
            # keep MICROsecond precision in state (events carry sub-ms
            # timestamps; a ms cast would truncate emitted values)
            incoming[ts_col] = (
                incoming[ts_col].values.astype("datetime64[us]").astype("int64")
            )
            buf = pd.concat([buf, incoming], ignore_index=True)
        wm_us = state.getCurrentWatermarkMs() * 1000
        emitted = None
        if len(buf):
            buf = buf.sort_values(sort_cols, kind="mergesort").reset_index(
                drop=True
            )
            final = buf[buf[ts_col] <= wm_us]
            if len(final):
                emitted = final.copy()
                emitted[key_col] = key[0]
                emitted["emit_seq"] = range(seq, seq + len(final))
                emitted[ts_col] = pd.to_datetime(emitted[ts_col], unit="us")
                seq += len(final)
                buf = buf[buf[ts_col] > wm_us]
        if len(buf):
            state.update(
                (buf[ts_col].tolist(),
                 *[buf[c].tolist() for c in pay_cols], seq)
            )
            # 1 ms early — Spark fires strictly above the set timestamp,
            # Flink's onTimer at wm >= t; flush re-checks ts <= wm
            state.setTimeoutTimestamp(
                max(int(buf[ts_col].min()) // 1000 - 1, wm_us // 1000 + 1)
            )
        else:
            state.update(([], *[[] for _ in pay_cols], seq))
        if emitted is not None:
            yield emitted[out_names]
        else:
            yield pd.DataFrame({c: [] for c in out_names})

    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType=state_fields,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def with_current_watermark(
    events: DataFrame,
    ts_col: str,
    delay: str,
    key_col: str,
    *,
    wm_col: str = "current_watermark",
) -> DataFrame:
    """CURRENT_WATERMARK() parity (reference
    BuiltInFunctionDefinitions.java:1754 — SQL ``CURRENT_WATERMARK(rowtime)``
    annotates rows with the operator's watermark at processing time).

    Spark exposes no expression-level watermark, but the stateful-processing
    API does (``GroupState.getCurrentWatermarkMs``) — so the annotation runs
    as a pass-through ``applyInPandasWithState`` op: rows stream through
    unchanged plus a ``wm_col`` timestamp column (NULL while the watermark
    is still unset, exactly the reference's nullable CURRENT_WATERMARK).
    ``key_col`` only sets the parallelism of the pass-through (the watermark
    is global per query, as in Spark's model; Flink's is per-operator).
    Typical uses carried over from the reference: routing late-but-accepted
    rows, debugging watermark lag, gating emission in custom operators.
    """
    cols = list(events.columns)
    out_fields = ", ".join(f"{c} {t}" for c, t in events.dtypes)
    out_schema = f"{out_fields}, {wm_col} timestamp"

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
        wm_ms = state.getCurrentWatermarkMs()
        # state must be touched for the engine to track the group; store the
        # last seen watermark (useful for debugging, not read back)
        state.update((int(wm_ms),))
        wm = (
            pd.Timestamp(wm_ms, unit="ms")
            if wm_ms > 0
            else pd.NaT  # unset watermark -> NULL, as in the reference
        )
        for pdf in batches:
            out = pdf[cols].copy()
            out[wm_col] = wm
            yield out

    return (
        events.withWatermark(ts_col, delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="wm_ms bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _interval_ms(s: str) -> int:
    """'10 minutes' / '1 day' / '500 milliseconds' → milliseconds.

    Delegates to operators.windows._interval_us so every operator
    documented as interval-equivalent parses the same unit table
    (singular/plural, millisecond..day) and raises the same descriptive
    ValueError on junk."""
    from flink_psl_spark.operators.windows import _interval_us

    return _interval_us(s) // 1000


def timer_session_agg(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    gap: str = "10 minutes",
    delay: str = "10 minutes",
) -> DataFrame:
    """Event-time session aggregation driven by REGISTERED TIMERS — the
    reference's KeyedProcessFunction pattern (buffer rows in keyed state,
    ``registerEventTimeTimer(last_ts + gap)``, finalize in ``onTimer``
    when the watermark passes; reference: KeyedProcessFunction.java
    onTimer / InternalTimerServiceImpl, and the session merging of
    EventTimeSessionWindows + EventTimeTrigger). The Spark counterpart of
    registerEventTimeTimer/onTimer is ``setTimeoutTimestamp`` +
    ``hasTimedOut`` under ``GroupStateTimeout.EventTimeTimeout`` — one
    event-time timer per key, fired by watermark passage. (Spark 4's
    ``transformWithStateInPandas`` timeMode='EventTime' +
    handleExpiredTimer is the N-timers generalization — implemented as
    :func:`timer_session_agg_tws`, protobuf-transport-gated and
    parity-tested; this GroupState form runs everywhere and is
    semantically identical for the one-timer-per-key pattern.)

    Distinct from the native ``session_window`` agg (stream_session_agg):
    this is the TIMER machinery itself — out-of-order rows buffer in
    typed-array state; each batch re-arms the key's timer at the earliest
    pending finalization point; firing sorts the buffer, splits on
    >= gap inactivity, emits every session whose (last + gap) the
    watermark has passed, retains the rest and re-arms. Emits
    (key, session_start, session_end, n, total) — session_end =
    last + gap, exactly session_window's bound.

    State per key = the un-finalized tail (bounded by the watermark: rows
    older than wm - gap always finalize on the next firing), plus one
    timer. Scale-safe at high key cardinality: RocksDB-backed state.
    """
    gap_us = _interval_ms(gap) * 1000  # µs state: events carry sub-ms ts
    src = events.select(key_col, ts_col, value_col).withWatermark(
        ts_col, delay
    )
    k_dt = _dt(src, key_col)
    out_schema = (
        f"{key_col} {k_dt}, session_start timestamp, "
        "session_end timestamp, n bigint, total double"
    )
    out_names = [key_col, "session_start", "session_end", "n", "total"]
    state_fields = "ts_us array<bigint>, v array<double>"

    def _sessions(buf: list[tuple[int, float]]):
        """Sorted buffer → [(start_us, last_us, n, total)], gap-split
        (break at inactivity >= gap, matching session_window merging)."""
        out: list[tuple[int, int, int, float]] = []
        for t, v in sorted(buf):
            if out and t - out[-1][1] < gap_us:
                s, last, n, tot = out[-1]
                out[-1] = (s, t, n + 1, tot + v)
            else:
                out.append((t, t, 1, v))
        return out

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
        buf: list[tuple[int, float]] = []
        if state.exists:
            ts_list, v_list = state.get
            buf = list(zip(ts_list, v_list))
        for pdf in batches:
            if not len(pdf):
                continue
            us = pdf[ts_col].values.astype("datetime64[us]").astype("int64")
            buf.extend(
                (int(t), float(v)) for t, v in zip(us, pdf[value_col])
            )
        wm_us = state.getCurrentWatermarkMs() * 1000
        done, keep = [], []
        for s, last, n, tot in _sessions(buf):
            if last + gap_us <= wm_us:  # "onTimer": wm passed the end
                done.append((s, last, n, tot))
            else:
                keep.extend((t, v) for t, v in buf if s <= t <= last)
        if keep:
            state.update(([t for t, _ in keep], [v for _, v in keep]))
            # re-arm at the earliest pending finalization point
            # (registerEventTimeTimer), 1 ms EARLY: Spark fires event-time
            # timeouts only when the watermark STRICTLY exceeds the set
            # timestamp, while Flink's onTimer fires at wm >= t — arming
            # at end-1ms keeps the boundary case (watermark landing
            # exactly on a session end) firing, and an early fire is
            # harmless because the flush predicate re-checks end <= wm
            # and re-arms. Must still be beyond the current watermark.
            nxt = min(last + gap_us for _, last, _, _ in _sessions(keep))
            state.setTimeoutTimestamp(
                max(nxt // 1000 - 1, wm_us // 1000 + 1)
            )
        else:
            state.remove()
        if done:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(done),
                    "session_start": pd.to_datetime(
                        [d[0] for d in done], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [d[1] + gap_us for d in done], unit="us"
                    ),
                    "n": [d[2] for d in done],
                    "total": [d[3] for d in done],
                }
            )
        else:
            yield pd.DataFrame({c: [] for c in out_names})

    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_fields,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def timer_session_agg_tws(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    gap: str = "10 minutes",
    delay: str = "10 minutes",
) -> DataFrame:
    """N-timer generalization of :func:`timer_session_agg` on Spark 4's
    ``transformWithStateInPandas`` (timeMode='EventTime'): ONE REGISTERED
    TIMER PER PENDING SESSION via ``handle.registerTimer`` /
    ``handleExpiredTimer`` — the exact shape of the reference's
    ``registerEventTimeTimer``/``onTimer`` multi-timer service
    (InternalTimerServiceImpl keeps a timer heap per key; GroupState
    offers only a single timeout slot, which timer_session_agg works
    around by re-arming at the earliest pending point).

    Output schema and session semantics are identical to
    timer_session_agg — the parity test asserts it where runnable. The
    Python transformWithState transport requires the ``protobuf``
    package; where absent this raises ImportError with guidance (the
    GroupState form runs everywhere).
    """
    try:
        import google.protobuf  # noqa: F401  (transformWithState transport)
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package; "
            "use timer_session_agg (GroupState form, identical "
            "semantics for this operator) where it is unavailable"
        ) from exc

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = _interval_ms(gap) * 1000
    src = events.select(key_col, ts_col, value_col).withWatermark(
        ts_col, delay
    )
    k_dt = _dt(src, key_col)
    out_schema = (
        f"{key_col} {k_dt}, session_start timestamp, "
        "session_end timestamp, n bigint, total double"
    )
    out_names = [key_col, "session_start", "session_end", "n", "total"]

    def _sessions(buf):
        out = []
        for t, v in sorted(buf):
            if out and t - out[-1][1] < gap_us:
                s, last, n, tot = out[-1]
                out[-1] = (s, t, n + 1, tot + v)
            else:
                out.append((t, t, 1, v))
        return out

    def _emit(key, done):
        return pd.DataFrame(
            {
                key_col: [key[0]] * len(done),
                "session_start": pd.to_datetime(
                    [d[0] for d in done], unit="us"
                ),
                "session_end": pd.to_datetime(
                    [d[1] + gap_us for d in done], unit="us"
                ),
                "n": [d[2] for d in done],
                "total": [d[3] for d in done],
            }
        )

    class SessionTimers(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._h = handle
            self._buf = handle.getListState("buf", "t_us bigint, v double")

        def _load(self):
            return [(int(r[0]), float(r[1])) for r in self._buf.get()]

        def _sync_timers(self, pending):
            """One event-time timer per pending session end (ms)."""
            # 1 ms early (the GroupState form's boundary rule): firing
            # early is harmless, _finalize re-checks end <= wm
            want = {(last + gap_us) // 1000 - 1 for _, last, _, _ in pending}
            have = set(self._h.listTimers())
            for ts in have - want:
                self._h.deleteTimer(ts)
            for ts in want - have:
                self._h.registerTimer(ts)

        def _finalize(self, key, wm_us):
            buf = self._load()
            done, keep = [], []
            for s, last, n, tot in _sessions(buf):
                if last + gap_us <= wm_us:
                    done.append((s, last, n, tot))
                else:
                    keep.extend((t, v) for t, v in buf if s <= t <= last)
            if keep:
                self._buf.put([(t, v) for t, v in keep])
            else:
                self._buf.clear()
            self._sync_timers(_sessions(keep))
            return done

        def handleInputRows(self, key, rows, timerValues):
            buf = self._load()
            for pdf in rows:
                if not len(pdf):
                    continue
                us = (
                    pdf[ts_col].values.astype("datetime64[us]")
                    .astype("int64")
                )
                buf.extend(
                    (int(t), float(v)) for t, v in zip(us, pdf[value_col])
                )
            self._buf.put([(t, v) for t, v in buf])
            wm_us = timerValues.getCurrentWatermarkInMs() * 1000
            done = self._finalize(key, wm_us)
            yield _emit(key, done) if done else pd.DataFrame(
                {c: [] for c in out_names}
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            wm_us = max(
                timerValues.getCurrentWatermarkInMs(),
                expiredTimerInfo.getExpiryTimeInMs(),
            ) * 1000
            done = self._finalize(key, wm_us)
            yield _emit(key, done) if done else pd.DataFrame(
                {c: [] for c in out_names}
            )

        def close(self) -> None:
            pass

    return src.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=SessionTimers(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="EventTime",
    )


def session_transcripts(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    turn_col: str,
    order_col: str,
    *,
    gap: str = "30 minutes",
    delay: str = "10 minutes",
    max_turns: int = 64,
) -> DataFrame:
    """STREAMING conversation assembly: the event-time-timer session
    machinery of :func:`timer_session_agg`, emitting ordered TRANSCRIPTS
    instead of numeric aggregates — the continuous-ingest counterpart of
    ``llm.assemble_conversations`` (chat-log → training-document at
    arrival time).

    Rows buffer as (ts, order, turn) in keyed state; watermark passage
    finalizes every gap-split session whose ``last + gap`` it has
    passed, emitting ``(key, session_n, n_turns, first_ts, last_ts,
    transcript)`` with turns concatenated in (ts, order) order and
    capped at ``max_turns``. ``session_n`` is a per-key ordinal carried
    in state: sessions finalize in start-time order per key (an earlier
    session's end always passes the watermark first), so the numbering
    equals the batch formulation's running-sum session id.

    State per key = the un-finalized tail + one counter + one timer —
    watermark-bounded exactly as timer_session_agg.
    """
    gap_us = _interval_ms(gap) * 1000
    src = events.select(key_col, ts_col, order_col, turn_col).withWatermark(
        ts_col, delay
    )
    k_dt = _dt(src, key_col)
    out_schema = (
        f"{key_col} {k_dt}, session_n bigint, n_turns bigint, "
        "first_ts timestamp, last_ts timestamp, transcript string"
    )
    out_names = [
        key_col, "session_n", "n_turns", "first_ts", "last_ts", "transcript"
    ]
    state_fields = (
        "n_done bigint, ts_us array<bigint>, ord array<bigint>, "
        "turn array<string>"
    )

    def _split(buf: list[tuple[int, int, str]]):
        """Sorted buffer → list of sessions (each a list of rows)."""
        out: list[list[tuple[int, int, str]]] = []
        for row in sorted(buf):
            if out and row[0] - out[-1][-1][0] <= gap_us:
                out[-1].append(row)
            else:
                out.append([row])
        return out

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
        n_done = 0
        buf: list[tuple[int, int, str]] = []
        if state.exists:
            n_done, ts_list, ord_list, turn_list = state.get
            buf = list(zip(ts_list, ord_list, turn_list))
        for pdf in batches:
            if not len(pdf):
                continue
            us = pdf[ts_col].values.astype("datetime64[us]").astype("int64")
            buf.extend(
                (int(t), int(o), str(v))
                for t, o, v in zip(us, pdf[order_col], pdf[turn_col])
            )
        wm_us = state.getCurrentWatermarkMs() * 1000
        done, keep = [], []
        for sess in _split(buf):
            if sess[-1][0] + gap_us <= wm_us:
                done.append(sess)
            else:
                keep.extend(sess)
        if keep:
            state.update(
                (
                    n_done + len(done),
                    [t for t, _, _ in keep],
                    [o for _, o, _ in keep],
                    [v for _, _, v in keep],
                )
            )
            nxt = min(s[-1][0] + gap_us for s in _split(keep))
            # 1 ms early — see timer_session_agg's boundary rule
            state.setTimeoutTimestamp(
                max(nxt // 1000 - 1, wm_us // 1000 + 1)
            )
        elif done:
            # key may still receive rows later: keep the ordinal counter
            state.update((n_done + len(done), [], [], []))
            state.setTimeoutTimestamp(wm_us // 1000 + 3_600_000)
        if done:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(done),
                    "session_n": [
                        n_done + i + 1 for i in range(len(done))
                    ],
                    "n_turns": [len(s) for s in done],
                    "first_ts": pd.to_datetime(
                        [s[0][0] for s in done], unit="us"
                    ),
                    "last_ts": pd.to_datetime(
                        [s[-1][0] for s in done], unit="us"
                    ),
                    "transcript": [
                        " ".join(v for _, _, v in s[:max_turns])
                        for s in done
                    ],
                }
            )
        else:
            yield pd.DataFrame({c: [] for c in out_names})

    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_fields,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_gap_fill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    bucket_ms: int = 3_600_000,
    delay: str = "1 second",
) -> DataFrame:
    """STREAMING last-observation-carried-forward resampling — the
    continuous form of operators.windows.gap_fill: per key, emit one
    append-mode row per ``bucket_ms`` bucket as soon as the watermark
    finalizes it (bucket end <= wm), carrying the latest value across
    empty buckets and marking carried rows ``filled``.

    Unlike the batch operator (whose grid stops at the last
    observation), the stream keeps emitting carried buckets while the
    watermark advances — a live metric stays defined between samples,
    which is exactly why pipelines run the streaming form.

    State per key: the carry value, the last emitted bucket, and the
    not-yet-finalized observation tail (watermark-bounded). Event-time
    timers re-arm at the next bucket end (1 ms early, the repo's timer
    boundary rule) so carried buckets flush even when the key itself
    receives no further data.
    """
    gap_us = bucket_ms * 1000
    src = events.select(key_col, ts_col, value_col).withWatermark(
        ts_col, delay
    )
    k_dt = _dt(src, key_col)
    out_schema = (
        f"{key_col} {k_dt}, bucket timestamp, "
        f"{value_col} double, filled boolean"
    )
    out_names = [key_col, "bucket", value_col, "filled"]
    state_fields = (
        "last_bucket_us bigint, carry double, "
        "ts_us array<bigint>, v array<double>"
    )

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            last_us, carry, ts_list, v_list = state.get
            buf = sorted(zip(ts_list, v_list))
        else:
            last_us, carry, buf = -1, None, []
        for pdf in batches:
            if not len(pdf):
                continue
            us = pdf[ts_col].values.astype("datetime64[us]").astype("int64")
            buf.extend(
                (int(t), float(v)) for t, v in zip(us, pdf[value_col])
            )
        buf.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        rows = []
        if buf or last_us >= 0:
            start = (
                last_us + gap_us
                if last_us >= 0
                else (buf[0][0] // gap_us) * gap_us
            )
            b = start
            i = 0
            while b + gap_us <= wm_us:
                observed = False
                while i < len(buf) and buf[i][0] < b + gap_us:
                    carry = buf[i][1]
                    if buf[i][0] >= b:
                        observed = True
                    i += 1
                if carry is not None:
                    rows.append((b, carry, not observed))
                    last_us = b
                b += gap_us
            buf = buf[i:]
        state.update(
            (
                last_us,
                carry,
                [t for t, _ in buf],
                [v for _, v in buf],
            )
        )
        if last_us >= 0 or buf:
            nxt = (last_us + 2 * gap_us) if last_us >= 0 else (
                (buf[0][0] // gap_us) * gap_us + gap_us
            )
            # 1 ms early — see timer_session_agg's boundary rule
            state.setTimeoutTimestamp(
                max(nxt // 1000 - 1, wm_us // 1000 + 1)
            )
        if rows:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(rows),
                    "bucket": pd.to_datetime(
                        [r[0] for r in rows], unit="us"
                    ),
                    value_col: [r[1] for r in rows],
                    "filled": [r[2] for r in rows],
                }
            )
        else:
            yield pd.DataFrame({c: [] for c in out_names})

    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_fields,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_ewma_anomaly(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    bucket_ms: int = 86_400_000,
    alpha: float = 0.25,
    threshold: float,
    delay: str = "1 second",
) -> DataFrame:
    """STREAMING EWMA smoothing + anomaly flags — the continuous form of
    operators.windows.ewma_anomaly: per key, bucket sums accumulate in
    state and the recurrence ``s_t = alpha*x_t + (1-alpha)*s_{t-1}``
    advances over each bucket AS THE WATERMARK FINALIZES IT (bucket end
    <= wm), emitting one append-mode row per observed bucket. The
    previous smoothed value is the only carried scalar, so this is the
    online metrics-monitoring loop: state per key = one double + the
    un-finalized bucket tail.

    Determinism: bucket sums accumulate as integer cents (exact,
    order-proof — equal to the batch DECIMAL(18,2) sum) and the
    recurrence uses the same fixed IEEE op order as the batch kernel,
    so finalized rows match the batch operator bit-for-bit.

    Event-time timers re-arm at the next pending bucket's end (1 ms
    early, the repo's timer boundary rule) so buffered buckets flush
    even when the key receives no further data.
    """
    bucket_us = bucket_ms * 1000
    a = float(alpha)
    thr = float(threshold)
    src = events.select(key_col, ts_col, value_col).withWatermark(
        ts_col, delay
    )
    k_dt = _dt(src, key_col)
    out_schema = (
        f"{key_col} {k_dt}, bucket_ts timestamp, x double, "
        "smoothed double, residual double, anomaly boolean"
    )
    out_names = [key_col, "bucket_ts", "x", "smoothed", "residual", "anomaly"]
    state_fields = (
        "has_s boolean, s double, b_us array<bigint>, cents array<bigint>"
    )

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            has_s, s_prev, b_list, c_list = state.get
            pend = dict(zip(b_list, c_list))
        else:
            has_s, s_prev, pend = False, 0.0, {}
        for pdf in batches:
            if not len(pdf):
                continue
            us = pdf[ts_col].values.astype("datetime64[us]").astype("int64")
            for t, v in zip(us, pdf[value_col]):
                b = (int(t) // bucket_us) * bucket_us
                pend[b] = pend.get(b, 0) + int(round(float(v) * 100))
        wm_us = state.getCurrentWatermarkMs() * 1000
        rows = []
        for b in sorted(k for k in pend if k + bucket_us <= wm_us):
            x = pend.pop(b) / 100.0
            if not has_s:
                s, res = x, 0.0
                has_s = True
            else:
                s = a * x + (1 - a) * s_prev
                res = x - s_prev
            rows.append((b, x, s, res, abs(res) > thr))
            s_prev = s
        state.update(
            (has_s, s_prev, list(pend.keys()), list(pend.values()))
        )
        if pend:
            nxt = min(pend) + bucket_us
            # 1 ms early — see timer_session_agg's boundary rule
            state.setTimeoutTimestamp(
                max(nxt // 1000 - 1, wm_us // 1000 + 1)
            )
        if rows:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(rows),
                    "bucket_ts": pd.to_datetime(
                        [r[0] for r in rows], unit="us"
                    ),
                    "x": [r[1] for r in rows],
                    # raw doubles — the caller rounds via F.round so the
                    # rounding path matches the batch operator's exactly
                    "smoothed": [r[2] for r in rows],
                    "residual": [r[3] for r in rows],
                    "anomaly": [r[4] for r in rows],
                }
            )
        else:
            yield pd.DataFrame({c: [] for c in out_names})

    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_fields,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_sft_loss_mask(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    turn_col: str,
    order_col: str,
    *,
    gap: str = "30 minutes",
    delay: str = "10 minutes",
    user_tag: str = "<u>",
    assistant_tag: str = "<a>",
) -> DataFrame:
    """STREAMING SFT loss-mask layout — the continuous-ingest counterpart
    of ``llm.sft_loss_mask``: the session machinery of
    :func:`session_transcripts`, emitting each watermark-finalized
    session's ASSISTANT-segment character spans (odd turns = user, even
    = assistant; tag + content rendering, render never materialized).

    Spans are plain integer arithmetic over the finalized session's
    ordered turns, so finalized rows equal the batch operator's exactly.
    State per key = the un-finalized tail + one ordinal + one timer.
    """
    gap_us = _interval_ms(gap) * 1000
    u_len, a_len = len(user_tag), len(assistant_tag)
    src = events.select(key_col, ts_col, order_col, turn_col).withWatermark(
        ts_col, delay
    )
    k_dt = _dt(src, key_col)
    out_schema = (
        f"{key_col} {k_dt}, session_n bigint, turn_idx int, "
        "mask_start bigint, mask_end bigint, render_len bigint"
    )
    out_names = [
        key_col, "session_n", "turn_idx",
        "mask_start", "mask_end", "render_len",
    ]
    state_fields = (
        "n_done bigint, ts_us array<bigint>, ord array<bigint>, "
        "turn array<string>"
    )

    def _split(buf):
        out = []
        for row in sorted(buf):
            if out and row[0] - out[-1][-1][0] <= gap_us:
                out[-1].append(row)
            else:
                out.append([row])
        return out

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
        n_done = 0
        buf: list[tuple[int, int, str]] = []
        if state.exists:
            n_done, ts_list, ord_list, turn_list = state.get
            buf = list(zip(ts_list, ord_list, turn_list))
        for pdf in batches:
            if not len(pdf):
                continue
            us = pdf[ts_col].values.astype("datetime64[us]").astype("int64")
            buf.extend(
                (int(t), int(o), str(v))
                for t, o, v in zip(us, pdf[order_col], pdf[turn_col])
            )
        wm_us = state.getCurrentWatermarkMs() * 1000
        done, keep = [], []
        for sess in _split(buf):
            if sess[-1][0] + gap_us <= wm_us:
                done.append(sess)
            else:
                keep.extend(sess)
        if keep:
            state.update(
                (
                    n_done + len(done),
                    [t for t, _, _ in keep],
                    [o for _, o, _ in keep],
                    [v for _, _, v in keep],
                )
            )
            nxt = min(s[-1][0] + gap_us for s in _split(keep))
            # 1 ms early — see timer_session_agg's boundary rule
            state.setTimeoutTimestamp(
                max(nxt // 1000 - 1, wm_us // 1000 + 1)
            )
        elif done:
            state.update((n_done + len(done), [], [], []))
            state.setTimeoutTimestamp(wm_us // 1000 + 3_600_000)
        rows = []
        for i, sess in enumerate(done):
            render_len = sum(
                (u_len if j % 2 == 0 else a_len) + len(v)
                for j, (_, _, v) in enumerate(sess)
            )
            cum = 0
            for j, (_, _, v) in enumerate(sess):
                tag = u_len if j % 2 == 0 else a_len
                seg = tag + len(v)
                if j % 2 == 1:  # assistant turn (1-based even index)
                    rows.append(
                        (
                            n_done + i + 1, j + 1,
                            cum + tag, cum + seg, render_len,
                        )
                    )
                cum += seg
        if rows:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(rows),
                    "session_n": [r[0] for r in rows],
                    "turn_idx": pd.Series(
                        [r[1] for r in rows], dtype="int32"
                    ),
                    "mask_start": [r[2] for r in rows],
                    "mask_end": [r[3] for r in rows],
                    "render_len": [r[4] for r in rows],
                }
            )
        else:
            yield pd.DataFrame({c: [] for c in out_names})

    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_fields,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
