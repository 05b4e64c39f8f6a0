"""Faithful streaming enrichment join (J1) — arbitrary stateful op.

Reference semantics (EnrichmentJoin.java:38-115, KeyedCoProcessFunction):
per join key,
- dim side: ValueState holding the LATEST dim row (processElement2
  overwrites unconditionally, :65) — kept forever, no TTL;
- fact side: if dim state present, emit joined row immediately
  (:55-57); else append the fact row to ListState (:59);
- when a dim row arrives, flush the buffered facts against it and
  clear the buffer (:66-69);
- no retraction: facts already emitted are never re-joined.

Spark re-expression: Structured Streaming has no two-input keyed
co-process, so the two streams are unioned with a side tag and fed
to ``applyInPandasWithState`` grouped by the join key. Per key the
state tuple holds (latest dim row, buffered fact rows), both as JSON
strings — schema-agnostic, and the buffer is bounded by the
first-match flush exactly like the reference's ListState.

Within one micro-batch the union carries no arrival order across the
two sources, so rows are applied in event-time order (``order_col``),
which is the only order a distributed replay can promise; the
reference's wall-clock arrival order is not reproducible anyway.

Scale notes: state is keyed and partitioned by the join key across
the state store (RocksDB-backed on a cluster); each key holds one
dim row + a buffer that drains on first match. The union is
shuffle-partitioned once on the key — the same single shuffle the
reference's keyBy pair performs.
"""

from __future__ import annotations

import json
import time
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType([
    T.StructField("dim_json", T.StringType()),
    T.StructField("buffer_json", T.StringType()),
    # wall-clock of the key's last activity, for the lazy TTL check
    T.StructField("last_touch_ms", T.LongType()),
])


def _join_output_schema(fact: DataFrame, dim: DataFrame, key: str) -> T.StructType:
    """Output = fact columns + dim columns minus the dim's join key
    (EnrichmentJoin.java:78-95 / getProducedType :97-114). Dim columns
    whose names collide with fact columns are also dropped — the
    reference's positional row concat would produce an ambiguous
    schema there; dropping keeps the output well-formed."""
    fields = list(fact.schema.fields)
    taken = {f.name for f in fields} | {key}
    fields += [f for f in dim.schema.fields if f.name not in taken]
    return T.StructType(fields)


def enrich_stream(fact: DataFrame, dim: DataFrame, key: str,
                  order_col: str, dim_order_col: str | None = None,
                  state_ttl_ms: int | None = None,
                  ttl_mode: str = "lazy") -> DataFrame:
    """Streaming enrichment join of two streaming DataFrames.

    ``fact`` and ``dim`` must share the join key column name ``key``
    (resolve case-mismatch before calling — SURVEY.md §2.1 quirk 1).
    ``order_col`` orders the fact side; ``dim_order_col`` (defaults
    to ``order_col``) orders the dim side — CDC streams each carry
    their own AsOf column.

    ``state_ttl_ms``: the reference keeps dim state forever
    (EnrichmentJoin.java has no TTL) — faithful default. At 100 TB an
    unbounded key space needs bounded state: a TTL expires a key's
    state after that many ms without any activity (processing-time,
    per key); a later fact for an expired key buffers again until the
    dim re-arrives, which is the reference's own cold-start path.

    ``ttl_mode`` picks how expiry is realized:

    - ``"lazy"`` (default): the last-touch wall clock is stored in
      state and checked on the key's next access — expired state is
      discarded before use. Deterministic join semantics, works
      under EVERY trigger including availableNow; an idle key's row
      lingers physically until next touched (or the store's own
      maintenance), but is semantically dead.
    - ``"evict"``: additionally arms a per-key
      ProcessingTimeTimeout so idle keys are physically removed.
      For CONTINUOUS deployments only: Spark never terminates an
      availableNow/once run while processing-time timeouts are
      pending (each no-data batch re-enters the timeout loop — we
      measured an unbounded 0-input batch spin), so run-to-
      completion tools must use "lazy".
    """
    if ttl_mode not in ("lazy", "evict"):
        raise ValueError(f"ttl_mode must be 'lazy' or 'evict', got {ttl_mode!r}")
    out_schema = _join_output_schema(fact, dim, key)
    fact_cols = [f.name for f in fact.schema.fields]
    dim_cols = [f.name for f in dim.schema.fields]
    out_cols = [f.name for f in out_schema.fields]
    dim_carry = [c for c in dim_cols if c != key and c not in fact_cols]

    # tagged union: side 0 = dim, side 1 = fact, payload as JSON
    def pack(df: DataFrame, side: int, ord_name: str) -> DataFrame:
        return df.select(
            F.col(key).alias("__key"),
            F.col(ord_name).cast("double").alias("__ord"),
            F.lit(side).alias("__side"),
            F.to_json(F.struct(*df.columns)).alias("__payload"),
        )

    unioned = pack(dim, 0, dim_order_col or order_col) \
        .unionByName(pack(fact, 1, order_col))

    ttl = state_ttl_ms

    def process(key_tuple: Any, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        now_ms = int(time.time() * 1000)
        if state.exists:
            dim_json, buffer_json, last_touch_ms = state.get
            if (ttl is not None and last_touch_ms is not None
                    and now_ms - last_touch_ms > ttl):
                # lazy expiry: the key sat idle past the TTL, so its
                # state is semantically dead — discard before use
                dim_json, buffer_json = None, "[]"
        else:
            dim_json, buffer_json = None, "[]"
        dim_row = json.loads(dim_json) if dim_json else None
        buffer: list[dict] = json.loads(buffer_json)
        out_rows: list[dict] = []

        def emit(fact_row: dict, dim_row: dict) -> None:
            row = dict(fact_row)
            row.update({c: dim_row.get(c) for c in dim_carry})
            out_rows.append(row)

        rows: list[tuple[float, int, str]] = []
        for pdf in pdfs:
            rows.extend(zip(pdf["__ord"], pdf["__side"], pdf["__payload"]))
        # event-time order; dim updates before facts at the same instant
        rows.sort(key=lambda r: (r[0], r[1]))

        for _ord, side, payload in rows:
            rec = json.loads(payload)
            if side == 0:                     # dim: overwrite latest,
                dim_row = rec                 # flush & clear buffer
                for b in buffer:              # (EnrichmentJoin.java:64-70)
                    emit(b, dim_row)
                buffer = []
            else:                             # fact
                if dim_row is not None:       # (:54-57)
                    emit(rec, dim_row)
                else:                         # (:58-60)
                    buffer.append(rec)

        state.update((json.dumps(dim_row) if dim_row else None,
                      json.dumps(buffer), now_ms))
        if ttl is not None and ttl_mode == "evict":
            state.setTimeoutDuration(ttl)
        if out_rows:
            out = pd.DataFrame(out_rows, columns=out_cols)
            # JSON round-trips timestamps as ISO strings; restore them
            for f in out_schema.fields:
                if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
                    out[f.name] = pd.to_datetime(out[f.name])
            yield out

    grouped = unioned.groupBy("__key")
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_ttl_ms is not None and ttl_mode == "evict"
               else GroupStateTimeout.NoTimeout)
    result = grouped.applyInPandasWithState(
        process, out_schema, _STATE_SCHEMA, "append", timeout)
    return result
