"""Enrichment join (J1) — the reference's one hand-written operator.

Reference semantics (EnrichmentJoin.java:23-115): keyed connect of a
fact stream with a dimension stream; the dim side keeps the *latest*
row per key in ValueState (processElement2 overwrites, :65); fact rows
join against it if present (:55-57) else buffer until the first dim
row arrives (:59, flushed at :66-69). Output = fact columns + dim
columns minus the dim's copy of the join key (:78-95). No retraction,
no TTL — effectively an inner join against the latest dim value.

Batch re-expression (this module): deduplicate the dimension to its
latest row per key, then inner-join. This is the *converged* state of
the reference operator once both streams are fully consumed, which is
what a batch/correctness comparison can observe. The faithful
streaming twin lives in ``streaming/stateful_join.py``.

Spark-first notes:
- latest-per-key uses max_by-style aggregation via a window
  ``row_number() = 1`` — a single shuffle on the key, no Python.
- the join key is resolved **case-insensitively**: the reference's
  second join is keyed ``AddressId`` vs the address side's
  ``AddressID`` (StreamingJob.java:113 vs sql/address.sql:2; SURVEY.md
  §2.1 quirk 1) — we implement the intended equi-join semantics.
- the dim side after latest-dedup is one row per key; when it is
  small (dimension tables usually are) Spark's AQE broadcasts it,
  avoiding a shuffle of the 100 TB fact side. Callers can force this
  with ``broadcast_dim=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _resolve(df: DataFrame, name: str) -> str:
    """Case-insensitive column resolution (quirk-1 correction)."""
    for c in df.columns:
        if c.lower() == name.lower():
            return c
    raise KeyError(f"column {name!r} not found in {df.columns}")


def latest_per_key(dim: DataFrame, key: str, order_col: str,
                   tiebreak: list[str] | None = None) -> DataFrame:
    """Latest dimension row per key — the ValueState overwrite
    (EnrichmentJoin.java:65) observed at end-of-stream.

    ``tiebreak`` columns make the result deterministic when several
    rows share the max ``order_col`` (the reference keeps arrival
    order, which batch has no notion of).
    """
    key_c = _resolve(dim, key)
    order_c = _resolve(dim, order_col)
    order_exprs = [F.col(order_c).desc()] + [
        F.col(_resolve(dim, t)).desc() for t in (tiebreak or [])]
    w = Window.partitionBy(key_c).orderBy(*order_exprs)
    return (dim.withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") == 1)
               .drop("__rn"))


def enrich(fact: DataFrame, dim: DataFrame, join_key: str,
           dim_order_col: str | None = None,
           dim_tiebreak: list[str] | None = None,
           broadcast_dim: bool | None = None) -> DataFrame:
    """Batch enrichment join mirroring ``enrich(stream, enrichment,
    joinKey)`` (EnrichmentJoin.java:23-36).

    Output columns = all fact columns + dim columns minus the dim's
    join key (EnrichmentJoin.java:78-95). Inner join: the reference
    never emits a fact row that found no dim match.

    ``broadcast_dim``: True force-broadcasts the dim side (bypasses
    autoBroadcastJoinThreshold — the caller asserts the dim fits in
    executor memory), False forbids it (a MERGE hint on the dim side
    pins a sort-merge join, which Catalyst honors over its own
    broadcast preference — so not even AQE auto-broadcasts), and the
    default None leaves the strategy to Catalyst/AQE. The default is deliberately not
    True: force-broadcasting an arbitrary caller's dimension risks
    OOM with no opt-in. Callers whose FACT side has no size stats
    (a ``from_json`` lineage — Spark has been observed BuildLeft-
    broadcasting a 150 k-row decoded fact side there) should pass
    True explicitly, as the verbatim-replay path does: the
    reference's own contract holds the dim in per-key ValueState
    (EnrichmentJoin.java:44), so dim-fits-in-memory is already its
    assumption.
    """
    fact_key = _resolve(fact, join_key)
    dim_key = _resolve(dim, join_key)

    d = dim
    if dim_order_col is not None:
        d = latest_per_key(d, dim_key, dim_order_col, dim_tiebreak)
    if broadcast_dim:
        d = F.broadcast(d)
    elif broadcast_dim is False:
        d = d.hint("merge")

    joined = fact.join(d, fact[fact_key] == d[dim_key], "inner")
    # drop the dim-side key copy and any dim column whose name collides
    # with a fact column (the reference's positional row concat would
    # produce an ambiguous schema there — same rule as the streaming
    # twin, streaming/stateful_join._join_output_schema)
    taken = set(fact.columns) | {dim_key}
    keep = [fact[c] for c in fact.columns] + \
           [d[c] for c in d.columns if c not in taken]
    return joined.select(*keep)
