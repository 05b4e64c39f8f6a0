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
there is pure overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~2M slim rows is a few hundred MB broadcast — the same ceiling the
# PageRank rank-side uses; callers with wide rows should pass less.
DEFAULT_BROADCAST_ROW_BOUND = 2_000_000

# (applicationId, plan semanticHash, max_rows) -> probe verdict. The
# verdict is a pure function of the input data, which is immutable
# within a session for every caller here (dims derived from the
# scale-point's parquet), so each distinct dim pays its probe job
# ONCE per session instead of once per query invocation — measured
# 0.4-0.9 s per probe on a joined dim at sf0.1, which would otherwise
# recur on every bench run of every converted query.
_PROBE_CACHE: dict[tuple, bool] = {}


def hint_broadcast_if_small(
        df: DataFrame,
        max_rows: int = DEFAULT_BROADCAST_ROW_BOUND) -> DataFrame:
    """Return ``broadcast(df)`` iff a bounded probe shows the frame
    holds at most ``max_rows`` rows; otherwise return ``df`` unhinted
    so the optimizer plans a shuffle join. The probe costs one small
    job, cached per (session, plan) — at 100 TB that is the price of
    not OOM-ing the executors."""
    key = (df.sparkSession.sparkContext.applicationId,
           df.semanticHash(), max_rows)
    small = _PROBE_CACHE.get(key)
    if small is None:
        small = df.limit(max_rows + 1).count() <= max_rows
        _PROBE_CACHE[key] = small
    return F.broadcast(df) if small else df
