"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's collector dedupes work at the file/chunk level; a
streaming log pipeline needs the row-level twin: "have I seen this key
recently?" across micro-batches. Spark's built-in ``dropDuplicates``
keeps state forever (or per watermark column); this operator keeps an
explicit last-seen timestamp per key with a TTL, which is the
bounded-state shape that survives unbounded streams:

- state per group key: last-seen event time
- a row passes iff its key is unseen or last seen more than ``ttl``
  ago; passing rows refresh the state
- state for keys idle past the TTL is dropped via timeout, so state
  size tracks the active-key working set, not stream history.

Arrow-batched pandas state function — the only Python in the streaming
hot path, as the brief's custom-stateful-operator escape hatch.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream_with_ttl(
    events: DataFrame,
    key_col: str,
    ts_col: str = "tp_timestamp",
    ttl_seconds: int = 3600,
) -> DataFrame:
    """Keep the first row per ``key_col`` within any ``ttl_seconds``
    window; suppress repeats until the key has been quiet for the TTL.

    Returns a streaming DataFrame with the input columns. State is one
    timestamp per active key, evicted on processing-time timeout."""
    in_schema = events.schema
    out_schema = in_schema
    state_schema = T.StructType(
        [T.StructField("last_seen_us", T.LongType())]
    )
    ttl_us = ttl_seconds * 1_000_000
    names = [f.name for f in in_schema.fields]
    if ts_col not in names:
        raise ValueError(f"{ts_col!r} not in stream schema {names}")

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        last = state.get[0] if state.exists else None
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col, kind="stable").reset_index(drop=True)
            # positional slice keeps dtypes intact — rebuilding rows from
            # iterrows Series upcasts mixed numeric columns to float64
            # and silently corrupts int64 ids beyond 2^53
            ts_us_col = [
                int(pd.Timestamp(v).value // 1000) for v in pdf[ts_col]
            ]
            keep_idx = []
            for i, ts_us in enumerate(ts_us_col):
                if last is None or ts_us - last > ttl_us:
                    keep_idx.append(i)
                    last = ts_us
                elif ts_us > last:
                    # seen within TTL: suppress but refresh recency so a
                    # steady drizzle of dupes stays suppressed
                    last = ts_us
            if keep_idx:
                out.append(pdf.iloc[keep_idx])
        if last is not None:
            state.update((last,))
            state.setTimeoutDuration(ttl_seconds * 1000)
        if out:
            yield pd.concat(out)[names]

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# --- budget-crossing alerts (arbitrary-state, history-dependent) ------
#
# "Alert every time a key's running total crosses another multiple of
# its budget" — emission depends on ALL history, so no window/agg can
# express it statelessly, yet per-key state is ONE long. (Spark 4's
# newer transformWithStateInPandas API would express this with a typed
# ValueState handle, but its state-server protocol needs protobuf,
# absent in this container — applyInPandasWithState carries the same
# semantics with the classic GroupState handle.)

def budget_alerts_stream(
    events: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    budget_milli: int,
) -> DataFrame:
    """Per-key budget-crossing alerts: one output row (key, cross_n,
    ts) per budget multiple crossed by the key's running total.

    Values accumulate as exact milli-unit longs (round(v*1000) — the
    fixed-point trick the oracle replays), so the running total is
    deterministic; rows are processed in (ts, value) order within each
    batch for cross-engine determinism.
    """
    import pandas as pd

    # key field keeps the input column's type — hardcoding LongType
    # breaks string keys with schema-mismatch nulls (r6 ADVICE)
    out_schema = T.StructType(
        [
            T.StructField(key_col, events.schema[key_col].dataType),
            T.StructField("cross_n", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    state_schema = T.StructType([T.StructField("total_milli", T.LongType())])

    def fn(key, pdf_iter, state: GroupState):
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values([ts_col, value_col], kind="mergesort").reset_index(
            drop=True
        )
        total = state.get[0] if state.exists else 0
        alerts = []
        vals = (pdf[value_col] * 1000).round().astype("int64")
        for v, ts in zip(vals, pdf[ts_col]):
            before = total // budget_milli
            total += int(v)
            after = total // budget_milli
            for cross in range(before + 1, after + 1):
                alerts.append({key_col: key[0], "cross_n": cross, "ts": ts})
        state.update((int(total),))
        if alerts:
            yield pd.DataFrame(alerts)

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
