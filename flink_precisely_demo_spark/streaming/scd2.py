"""Streaming SCD2: incremental dimension-history maintenance.

Batch ``cdc_history_scd2`` (plans/cdc_queries.py) recomputes the
whole version table with a per-key lead() window. A live CDC feed
needs the INCREMENTAL form: as each change arrives, the key's open
version (if any) is closed at the new change's timestamp and emitted
— a closed version is an immutable fact, so emission is append-mode
safe — while the new open version replaces it in keyed state
(I/U open a version; D closes without opening). Spark has no
built-in operator for this (``dropDuplicates``/window aggs cannot
hold "one open interval per key" across triggers), so it is an
``applyInPandasWithState`` stateful op, the same shape as the
enrichment join port (streaming/stateful_join.py).

Semantics vs the batch operator: replaying a finite feed and then
flushing the still-open state yields EXACTLY the batch operator's
output — closed versions match rows with ``valid_to IS NOT NULL``,
open state matches the ``is_current`` rows (asserted by
tests/test_streaming.py::test_streaming_scd2_matches_batch).

Ordering contract: a key's changes must arrive in per-key log
order ACROSS triggers (the guarantee a real CDC feed provides — a
key's changes are emitted in commit order, and Kafka preserves
per-partition order). Within one micro-batch, rows are sorted by
(ts, trans_id, row_seq) before applying, so intra-batch arrival
order never matters.

Scale notes: state is one open version per key — the minimum any
SCD2 maintainer can hold — partitioned across the state store by
key (RocksDB on a cluster). Each trigger shuffles only that batch's
changes, once, on the key. Within a micro-batch, changes are applied
in (ts, trans_id, row_seq) order — the reference envelope's own
total-order rule — so cross-batch and single-batch replays agree.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: per-key state: the open version, JSON {"ts": iso, "value": float}
_STATE_SCHEMA = T.StructType([T.StructField("open_json", T.StringType())])

SCD2_OUTPUT_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("valid_from", T.TimestampType()),
    T.StructField("valid_to", T.TimestampType()),
])


def scd2_stream(changes: DataFrame) -> DataFrame:
    """``changes``: streaming DataFrame with columns
    (key long, m string in I/U/D, ts timestamp, value double,
    trans_id long, row_seq int). Returns the stream of CLOSED
    versions (append-safe); open versions live in state until a
    later change closes them (read them back with
    :func:`open_versions_snapshot` semantics in tests, or run the
    batch operator for a point-in-time full table)."""

    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        # This function runs once PER KEY per trigger — with a
        # bounded key domain that is tens of thousands of calls per
        # replay, so per-call pandas machinery (pd.concat,
        # DataFrame.sort_values, itertuples) dominated the whole
        # query (guide §4.2). Work on plain Python lists instead:
        # a tiny group's tuple-sort is microseconds where
        # sort_values was ~0.4 ms.
        recs: list[tuple] = []
        for c in pdfs:
            recs.extend(zip(c["ts"].tolist(), c["trans_id"].tolist(),
                            c["row_seq"].tolist(), c["m"].tolist(),
                            c["value"].tolist()))
        recs.sort(key=lambda r: (r[0], r[1], r[2]))
        if state.exists:
            (open_json,) = state.get
            cur = json.loads(open_json) if open_json else None
        else:
            cur = None
        k = int(key[0])
        out_key: list[int] = []
        out_val: list[float] = []
        out_from: list[pd.Timestamp] = []
        out_to: list[pd.Timestamp] = []
        for ts, _tid, _seq, m, value in recs:
            if cur is not None:
                out_key.append(k)
                out_val.append(cur["value"])
                out_from.append(pd.Timestamp(cur["ts"]))
                out_to.append(ts)
            if m == "D":
                cur = None
            else:
                cur = {"ts": ts.isoformat(), "value": float(value)}
        if cur is None:
            if state.exists:
                state.remove()
        else:
            state.update((json.dumps(cur),))
        if out_key:
            yield pd.DataFrame({"key": out_key, "value": out_val,
                                "valid_from": out_from,
                                "valid_to": out_to})

    return (changes.groupBy("key")
            .applyInPandasWithState(
                fn, SCD2_OUTPUT_SCHEMA, _STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))
