"""Explicit Bloom-filter semi-join pruning.

The runtime-filter technique behind Spark's
`spark.sql.optimizer.runtime.bloomFilter.enabled` (and the classic
distributed-join optimization: ship an O(bits) summary of the build
side to prune the probe scan before the shuffle), made explicit and
engine-portable:

- build side: k=3 positions per key, h_i(key) = 60-bit md5 prefix of
  ``key || ':' || i`` mod m — the DISTINCT position set IS the
  bitmap (a 2048-bit filter is at most 2048 rows of one int each, a
  guaranteed broadcast);
- probe side: a row passes iff ALL of its k positions are set.
  Membership never yields a false negative (the exact-semi-join
  contract), only bounded false positives.

The md5-derived hash family is bit-reproducible in any engine
(`('0x' || substring(md5(..),1,15))::BIGINT` on the DuckDB side), so
bloom-pass and false-positive COUNTS are deterministic — full-hash
oracle material, unlike library bloom implementations whose bit
layouts differ per engine.

At 100 TB: the position set broadcasts (never more than m rows); the
probe side stays in its scan stage — 3 narrow hash expressions, one
broadcast-hash-join membership probe, no shuffle of probe rows that
fail the filter. Probe rows that pass continue into the real join at
a fraction of the shuffle volume (1 - selectivity + fp_rate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _position(key: Column, seed: int, m: int) -> Column:
    h = F.conv(F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(f":{seed}"))),
        1, 15), 16, 10).cast("long")
    return (h % m).cast("long")


def bloom_positions(keys: DataFrame, key_col: str, m: int = 2048,
                    k: int = 3) -> DataFrame:
    """The filter: DISTINCT hash positions of the build-side keys.
    <= min(k * n_keys, m) rows of one long each — always tiny."""
    key = F.col(key_col)
    arr = F.array(*[_position(key, i, m) for i in range(k)])
    return (keys.select(F.explode(arr).alias("pos")).distinct())


def bloom_probe(probe: DataFrame, probe_key: str,
                positions: DataFrame, m: int = 2048,
                k: int = 3) -> DataFrame:
    """Adds ``bloom_pass`` to `probe`: true iff every hash position
    of the row's key is present in `positions` (broadcast).

    Membership is decided per DISTINCT key — the k-position probe
    joins the broadcast position set once per key, not once per row,
    then rides back onto the probe rows through a second broadcast
    join (passing keys number at most the build-side cardinality
    plus false positives — small by construction). The probe TABLE
    never shuffles; only its distinct key column does, and that
    distinct is itself map-side-combined."""
    def key_positions(c: Column) -> Column:
        return F.array_distinct(
            F.array(*[_position(c, i, m) for i in range(k)]))

    keys = (probe.select(F.col(probe_key).alias("__k")).distinct()
            .withColumn("__n_req",
                        F.size(key_positions(F.col("__k")))))
    exploded = keys.withColumn(
        "pos", F.explode(key_positions(F.col("__k"))))
    passing = (exploded.join(F.broadcast(positions), "pos")
               .groupBy("__k", "__n_req")
               .agg(F.count(F.lit(1)).alias("__n_hit"))
               .filter(F.col("__n_hit") == F.col("__n_req"))
               .select(F.col("__k"), F.lit(True).alias("bloom_pass")))
    return (probe.join(
        F.broadcast(passing),
        probe[probe_key] == passing["__k"], "left")
        .drop("__k")
        .fillna({"bloom_pass": False}))
