"""Size-conditioned broadcast hint.

An unconditional ``F.broadcast(dim)`` is a latent OOM whenever the
dim's row count grows with the data (part, supplier, customer, a
vocabulary, a rule table): the hint overrides Spark's own
autoBroadcastJoinThreshold, so past some SF the "small" side no
longer fits executor memory and the job dies — the one failure mode
AQE cannot save you from, because an explicit hint wins.

``hint_broadcast_if_small`` measures before hinting: a bounded
``limit(max_rows + 1).count()`` probe (each scan task stops after the
partial limit, so the probe's cost is capped regardless of input
size) decides between the broadcast hint and the plain frame, where
Catalyst/AQE picks a shuffle join. This is the generalization of the
PageRank pattern (plans/graph_queries.py `_BROADCAST_HOST_LIMIT`) the
r9 verdict asked to apply to every SF-growing broadcast side.

Fixed-cardinality sides (nation/region, 1-row aggregates, seed lists
bounded by construction) keep their unconditional hints — a probe
there is pure overhead. The full call-site inventory is pinned at
site granularity by tests/test_scale_patterns.py::
test_no_unconditional_broadcast_on_sf_growing_sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: broadcast budget the default row bound is derived from — a hinted
#: side around this size is a comfortable executor-memory fit at the
#: default 4-8 GB executor sizings.
TARGET_BROADCAST_BYTES = 256 * 2**20

#: hard row ceiling regardless of estimated width (the r9/r10 slim-row
#: ceiling, same as the PageRank rank-side limit): beyond ~2M rows the
#: driver-side collect + torrent rebroadcast dominates even when the
#: bytes fit.
DEFAULT_BROADCAST_ROW_BOUND = 2_000_000

#: row-bound floor so pathological width estimates (huge structs,
#: nested arrays) can never reject a trivially small frame.
_MIN_ROW_BOUND = 10_000

# (applicationId, plan semanticHash, max_rows) -> probe verdict. The
# verdict is a pure function of the input data, which is immutable
# within a session for every caller here (dims derived from the
# scale-point's parquet), so each distinct dim pays its probe job
# ONCE per session instead of once per query invocation — measured
# 0.4-0.9 s per probe on a joined dim at sf0.1, which would otherwise
# recur on every bench run of every converted query. Entries are
# evicted whenever a probe runs under a NEW applicationId (session
# restart in a long-lived process: test suites, notebooks), so the
# dict cannot grow with dead sessions; races just cost a benign
# duplicate probe.
_PROBE_CACHE: dict[tuple, bool] = {}


def _estimated_row_bytes(dtype: T.DataType) -> int:
    """Schema-driven per-row width estimate (bytes) for sizing the
    default probe bound. Deliberately rough — the goal is to scale
    the ROW bound so a wide frame (many strings, embedding arrays)
    gets a proportionally smaller bound instead of the slim-row 2M
    default (r10 advisory: the bound is rows, not bytes)."""
    if isinstance(dtype, T.StructType):
        return sum(_estimated_row_bytes(f.dataType) for f in dtype.fields)
    if isinstance(dtype, T.ArrayType):
        # embeddings and token lists dominate the array columns here;
        # assume ~64 elements
        return 64 * _estimated_row_bytes(dtype.elementType)
    if isinstance(dtype, T.MapType):
        return 64 * (_estimated_row_bytes(dtype.keyType)
                     + _estimated_row_bytes(dtype.valueType))
    if isinstance(dtype, (T.StringType, T.BinaryType)):
        return 48
    if isinstance(dtype, T.DecimalType):
        return 16
    if isinstance(dtype, (T.DoubleType, T.LongType, T.TimestampType,
                          T.TimestampNTZType)):
        return 8
    if isinstance(dtype, (T.BooleanType, T.ByteType)):
        return 1
    return 4  # int/float/date/short


def default_row_bound(df: DataFrame) -> int:
    """Width-scaled default probe bound: TARGET_BROADCAST_BYTES over
    the schema's estimated row width, clamped to
    [_MIN_ROW_BOUND, DEFAULT_BROADCAST_ROW_BOUND]. A 2-column long
    dim keeps the slim 2M ceiling; a 10-string-column frame or an
    embedding carrier gets a proportionally smaller bound."""
    width = max(1, _estimated_row_bytes(df.schema))
    return max(_MIN_ROW_BOUND,
               min(DEFAULT_BROADCAST_ROW_BOUND,
                   TARGET_BROADCAST_BYTES // width))


def hint_broadcast_if_small(df: DataFrame,
                            max_rows: int | None = None) -> DataFrame:
    """Return ``broadcast(df)`` iff a bounded probe shows the frame
    holds at most ``max_rows`` rows (default: width-scaled via
    :func:`default_row_bound`); otherwise return ``df`` unhinted so
    the optimizer plans a shuffle join. The probe costs one small
    job, cached per (session, plan) — at 100 TB that is the price of
    not OOM-ing the executors.

    Static frames only: ``limit().count()`` is illegal on a stream,
    and a stream-static join must probe the STATIC side (see
    streaming/pipeline.py) — enforced here rather than by comment."""
    if df.isStreaming:
        raise ValueError(
            "hint_broadcast_if_small probes with limit().count(), "
            "which is illegal on a streaming DataFrame — in a "
            "stream-static join, probe the static side instead")
    if max_rows is None:
        max_rows = default_row_bound(df)
    app_id = df.sparkSession.sparkContext.applicationId
    key = (app_id, df.semanticHash(), max_rows)
    small = _PROBE_CACHE.get(key)
    if small is None:
        for k in [k for k in _PROBE_CACHE if k[0] != app_id]:
            _PROBE_CACHE.pop(k, None)  # drop dead-session verdicts
        small = df.limit(max_rows + 1).count() <= max_rows
        _PROBE_CACHE[key] = small
    return F.broadcast(df) if small else df
