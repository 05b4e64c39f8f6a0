"""Streaming first-touch funnel — the streaming twin of the batch
`event_funnel_steps` query (plans/window_queries.py).

Semantics (identical to the batch min-chain): per user,
t1 = earliest 'view'; t2 = earliest 'click' in [t1, t1 + window];
t3 = earliest 'purchase' in [t2, t1 + window]. The min-chain is NOT
monotone under out-of-order arrival — a late earlier view shifts the
whole window backward and may admit clicks that were previously
outside it — so per-user state buffers the relevant timestamps and
the chain is recomputed per micro-batch. Correct-by-construction on
any arrival order: after all data is absorbed the snapshot equals
the batch query (tested on shuffled multi-batch replays).

Bounded state, watermark-driven:
- only the MIN view timestamp is stored (a later view can never
  lower it);
- clicks/purchases above t1 + window are dropped immediately (the
  window endpoint only ever moves down);
- once the watermark passes t1, t1 is FINAL (an earlier view can no
  longer arrive), so clicks/purchases below t1 are evicted — the
  retained lists are bounded by one conversion window of per-user
  activity;
- once the watermark passes min(t3, t1 + window) the funnel is
  FINAL: state collapses to a tombstone so a straggler can never
  reopen the user with a bogus later-view chain.

Scale shape: one keyed shuffle into the state store per trigger
(RocksDB-backed on a cluster), state per user = 2 scalars + two
window-bounded lists + the tombstone bit.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType([
    # all instants are MICROSECONDS since epoch — the native
    # granularity of the events feed, so the snapshot timestamps are
    # bit-equal to the batch query's
    T.StructField("min_view_ms", T.LongType()),
    T.StructField("clicks_json", T.StringType()),
    T.StructField("purchases_json", T.StringType()),
    T.StructField("n_seen", T.LongType()),
    T.StructField("done", T.BooleanType()),
])

FUNNEL_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("first_view", T.TimestampType()),
    T.StructField("first_click", T.TimestampType()),
    T.StructField("first_purchase", T.TimestampType()),
    T.StructField("funnel_stage", T.IntegerType()),
    T.StructField("n_seen", T.LongType()),
])


def _ts(us: int | None) -> pd.Timestamp | None:
    return None if us is None else pd.Timestamp(us, unit="us")


def funnel_stream(events: DataFrame,
                  window_ms: int = 3_600_000) -> DataFrame:
    """``events``: streaming DataFrame with (user_id long,
    event_type string, ts timestamp). Returns the per-user funnel
    snapshot stream (update mode; the row with the highest
    ``n_seen`` per user is the latest). Attach a watermark on ``ts``
    upstream to activate state eviction and finalization."""

    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            min_view_ms, clicks_json, purchases_json, n_seen, done = \
                state.get
            clicks = json.loads(clicks_json)
            purchases = json.loads(purchases_json)
        else:
            min_view_ms, clicks, purchases, n_seen, done = \
                None, [], [], 0, False
        if done:
            # finalized tombstone: stragglers cannot reopen the user
            yield pd.DataFrame([], columns=[f.name for f in
                                            FUNNEL_OUTPUT_SCHEMA])
            return

        us = (rows["ts"].astype("int64") // 1_000)
        for t, ev in zip(us, rows["event_type"]):
            t = int(t)
            if ev == "view":
                if min_view_ms is None or t < min_view_ms:
                    min_view_ms = t
            elif ev == "click":
                clicks.append(t)
            elif ev == "purchase":
                purchases.append(t)
        n_seen += len(rows)

        # recompute the chain from the buffered timestamps (micros)
        window_us = window_ms * 1000
        t1 = min_view_ms
        t2 = t3 = None
        if t1 is not None:
            end = t1 + window_us
            in_win = [c for c in clicks if t1 <= c <= end]
            t2 = min(in_win) if in_win else None
            if t2 is not None:
                in_win = [p for p in purchases if t2 <= p <= end]
                t3 = min(in_win) if in_win else None

        wm = state.getCurrentWatermarkMs() * 1000   # ms -> us
        if t1 is not None:
            end = t1 + window_us
            # above the window endpoint: can never qualify (the
            # endpoint only moves down as earlier views arrive)
            clicks = [c for c in clicks if c <= end]
            purchases = [p for p in purchases if p <= end]
            if wm >= t1:
                # t1 is final: nothing below it can matter any more
                clicks = [c for c in clicks if c >= t1]
                purchases = [p for p in purchases if p >= t1]
            final_at = t3 if t3 is not None else end
            if wm >= final_at:
                done = True

        if done:
            state.update((min_view_ms, "[]", "[]", n_seen, True))
        else:
            state.update((min_view_ms, json.dumps(sorted(clicks)),
                          json.dumps(sorted(purchases)), n_seen, False))
        stage = 3 if t3 is not None else 2 if t2 is not None \
            else 1 if t1 is not None else 0
        yield pd.DataFrame([{
            "user_id": int(key[0]),
            "first_view": _ts(t1),
            "first_click": _ts(t2),
            "first_purchase": _ts(t3),
            "funnel_stage": stage,
            "n_seen": n_seen,
        }])

    return (events.groupBy("user_id")
            .applyInPandasWithState(
                fn, FUNNEL_OUTPUT_SCHEMA, _STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))
