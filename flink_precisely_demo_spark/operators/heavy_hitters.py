"""Distributed Misra-Gries heavy-hitters sketch.

The classical streaming frequency summary (Misra & Gries 1982;
mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012)
as a Spark operator:

- **Map side**: each partition folds its items through a
  capacity-``m`` Misra-Gries counter inside ``mapInPandas`` (Arrow
  batches, one dict of at most ``m`` entries per partition — no
  per-row Python UDF, no state beyond the summary itself). A
  partition emits at most ``m`` (item, mg_count) rows.
- **Merge side**: one ``groupBy(item).sum()`` over the <=
  ``m * n_partitions`` summary rows. Plain summation preserves both
  sketch invariants, because each per-partition count is an
  underestimate and each partition's total deduction is at most
  ``n_p / (m + 1)``:

  1. *underestimate*:  mg(x) <= f(x)           (never overcounts)
  2. *deduction bound*: f(x) - mg(x) <= n/(m+1) (sum of per-partition
     bounds; n = total item count)

  Both hold for EVERY item under ANY partitioning of the input, which
  is what makes them usable as deterministic, hash-checkable oracle
  verdicts even though the sketch contents themselves depend on the
  partition layout.

At 100 TB the only shuffle is the summary merge: ``m`` rows per
partition regardless of data volume — the sketch is the map-side
compression. No reference counterpart (SURVEY.md §2.3 extension
scope).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def misra_gries_summary(df: DataFrame, item_col: str,
                        capacity: int = 8) -> DataFrame:
    """(item, mg_count) — merged Misra-Gries summary of `item_col`.

    `mg_count` underestimates the true frequency by at most
    n/(capacity+1) in total. Output size <= capacity * n_partitions
    before the merge, <= distinct(item) after.
    """
    m = capacity

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for item in pdf[item_col]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < m:
                    counters[item] = 1
                else:
                    # decrement round: every counter drops by 1,
                    # zeros evicted (the arriving item is "spent"
                    # against the round, uncounted)
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        yield pd.DataFrame(
            {item_col: list(counters), "mg_count": list(counters.values())}
        ) if counters else pd.DataFrame({item_col: [], "mg_count": []})

    # the item field keeps the INPUT column's type (r8 advisory: a
    # hardcoded string schema silently stringified long keys)
    out_schema = T.StructType([
        df.schema[item_col],
        T.StructField("mg_count", T.LongType()),
    ])
    summaries = df.select(item_col).mapInPandas(fold, schema=out_schema)
    return summaries.groupBy(item_col).agg(
        F.sum("mg_count").alias("mg_count"))
