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


def hint_broadcast_if_small(
        df: DataFrame,
        max_rows: int = DEFAULT_BROADCAST_ROW_BOUND) -> DataFrame:
    """Return ``broadcast(df)`` iff a bounded probe shows the frame
    holds at most ``max_rows`` rows; otherwise return ``df`` unhinted
    so the optimizer plans a shuffle join. The probe costs one small
    job; at 100 TB that is the price of not OOM-ing the executors."""
    if df.limit(max_rows + 1).count() <= max_rows:
        return F.broadcast(df)
    return df
