"""Enrichment join via transformWithStateInPandas (Spark 4).

The closest structural analogue of the reference operator: where
EnrichmentJoin.java:44-45 declares

    ValueState<Row> enrichment;   // latest dim row per key
    ListState<Row>  records;      // facts buffered until first match

this StatefulProcessor declares a ValueState and a ListState through
the typed state handle API (handle.getValueState/getListState) —
the state primitives map 1:1, unlike applyInPandasWithState's single
state tuple (see stateful_join.py, the portable default).

Requires the RocksDB state store provider (the HDFS-backed default
does not support transformWithState); ``tws_session_confs()`` returns
the confs to set. Rows are applied in event-time order within a
micro-batch (same convention as stateful_join.py).

Environment gate: the TWS Python state protocol imports
``google.protobuf``, which is not installed in the test container —
the test suite skips this variant there (verified: the query plan
builds; the crash is the protobuf import inside Spark's
transform_with_state_driver_worker). stateful_join.enrich_stream is
the portable default; this module is the drop-in upgrade where
protobuf is available.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .stateful_join import _join_output_schema


def tws_session_confs() -> dict[str, str]:
    return {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
    }


class _EnrichProcessor(StatefulProcessor):
    """Per-key latest-dim + fact-buffer co-process
    (EnrichmentJoin.java:38-115 semantics)."""

    def __init__(self, out_cols: list[str], dim_carry: list[str],
                 ts_fields: list[str]):
        self.out_cols = out_cols
        self.dim_carry = dim_carry
        self.ts_fields = ts_fields

    def init(self, handle: StatefulProcessorHandle) -> None:
        # ValueState<Row> enrichment (:44) — latest dim as JSON
        self.dim_state = handle.getValueState(
            "dim", T.StructType([T.StructField("j", T.StringType())]))
        # ListState<Row> records (:45) — buffered facts as JSON
        self.buffer_state = handle.getListState(
            "buffer", T.StructType([T.StructField("j", T.StringType())]))

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame],
                        timerValues) -> Iterator[pd.DataFrame]:
        dim_row = None
        if self.dim_state.exists():
            dim_row = json.loads(self.dim_state.get()[0])
        buffer = [json.loads(r[0]) for r in self.buffer_state.get()]

        out_rows: list[dict] = []

        def emit(fact_row: dict, dim: dict) -> None:
            row = dict(fact_row)
            row.update({c: dim.get(c) for c in self.dim_carry})
            out_rows.append(row)

        pending: list[tuple[float, int, str]] = []
        for pdf in rows:
            pending.extend(zip(pdf["__ord"], pdf["__side"], pdf["__payload"]))
        pending.sort(key=lambda r: (r[0], r[1]))

        for _ord, side, payload in pending:
            rec = json.loads(payload)
            if side == 0:                          # processElement2 (:62-70)
                dim_row = rec
                for b in buffer:
                    emit(b, dim_row)
                buffer = []
            else:                                  # processElement1 (:50-60)
                if dim_row is not None:
                    emit(rec, dim_row)
                else:
                    buffer.append(rec)

        if dim_row is not None:
            self.dim_state.update((json.dumps(dim_row),))
        self.buffer_state.clear()
        if buffer:
            self.buffer_state.appendList([(json.dumps(b),) for b in buffer])

        if out_rows:
            out = pd.DataFrame(out_rows, columns=self.out_cols)
            for c in self.ts_fields:
                out[c] = pd.to_datetime(out[c])
            yield out

    def close(self) -> None:
        pass


def enrich_stream_tws(fact: DataFrame, dim: DataFrame, key: str,
                      order_col: str) -> DataFrame:
    """transformWithStateInPandas twin of stateful_join.enrich_stream
    (same tagged-union input shape, same output contract)."""
    out_schema = _join_output_schema(fact, dim, key)
    fact_cols = [f.name for f in fact.schema.fields]
    dim_carry = [f.name for f in dim.schema.fields
                 if f.name != key and f.name not in fact_cols]
    ts_fields = [f.name for f in out_schema.fields
                 if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))]

    def pack(df: DataFrame, side: int) -> DataFrame:
        return df.select(
            F.col(key).alias("__key"),
            F.col(order_col).cast("double").alias("__ord"),
            F.lit(side).alias("__side"),
            F.to_json(F.struct(*df.columns)).alias("__payload"))

    unioned = pack(dim, 0).unionByName(pack(fact, 1))
    proc = _EnrichProcessor([f.name for f in out_schema.fields],
                            dim_carry, ts_fields)
    return unioned.groupBy("__key").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="None")
