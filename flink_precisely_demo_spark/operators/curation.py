"""Dataset-curation operators for training-data pipelines
(SURVEY.md §2.3 extension scope): deterministic sampling, train/
val/test splitting, benchmark-contamination detection, token-budget
packing.

All of them avoid the two classic curation scale-traps:

- Random sampling (`df.sample`) is irreproducible across runs and
  engines. Every selection here is a pure function of the row key —
  ``md5(salt || key) % 100`` — so a 10% sample is the SAME 10% on
  any engine, any partitioning, any day: re-runs are incremental and
  auditable, and the DuckDB oracles reproduce them bit-for-bit.
- Global ordering (one big sort / one cumulative window) serializes
  at 100 TB. Packing runs per shard group (e.g. lang x source): the
  cumsum window parallelizes across groups, matching how a real
  corpus is sharded.

Contamination is the LSH-free exact form of cross-set overlap: an
inverted-index equi-join on shingles (corpus docs only ever meet
benchmark docs that share a shingle — never a cross join), the same
sparse-join shape as ngram_jaccard_pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _fan_out, word_shingles


def hash_bucket(key: Column, salt: str = "", buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from md5(salt || key) — the
    reproducible-sampling primitive (15 hex chars = 60 bits — one
    nibble under 64 so the value always fits a signed BIGINT in the
    DuckDB oracle twin; skew at 60 bits is still negligible)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % buckets).cast("int")


def deterministic_sample(df: DataFrame, key_col: str, pct: int,
                         salt: str = "") -> DataFrame:
    """Keep rows whose hash bucket < pct (a stable pct% sample)."""
    return df.filter(hash_bucket(F.col(key_col), salt) < pct)


def train_val_test_split(df: DataFrame, key_col: str, val_pct: int = 10,
                         test_pct: int = 10, salt: str = "split") -> DataFrame:
    """Adds a ``split`` column ('train'/'val'/'test') by hash bucket:
    the assignment is stable under corpus growth — a doc never moves
    between splits when new docs arrive (the leakage-safety property
    random splitting lacks)."""
    b = hash_bucket(F.col(key_col), salt)
    return df.withColumn(
        "split",
        F.when(b < 100 - val_pct - test_pct, F.lit("train"))
         .when(b < 100 - test_pct, F.lit("val"))
         .otherwise(F.lit("test")))


def contamination_pairs(corpus: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle_n: int = 5, min_overlap: int = 3,
                        max_df: int = 1000) -> DataFrame:
    """(corpus_id, benchmark_id, n_shared) for pairs sharing >=
    ``min_overlap`` distinct word n-grams — the decontamination check
    run before training on scraped data. Inverted-index equi-join on
    the shingle: cost bounded by shingle collision lists.

    Corpus-side shingles with document frequency > ``max_df`` are
    dropped before the join (a boilerplate 5-gram in k corpus docs
    meeting m benchmark docs is k*m join rows from one key). The df
    window partitions on the join key, so no extra shuffle; dropped
    stop-shingles only lose pairs whose entire overlap is
    boilerplate — not contamination evidence."""
    raw_c = _fan_out(corpus, id_col).select(
        F.col(id_col).alias("corpus_id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("sh"))
    w = Window.partitionBy("sh")
    c = (raw_c.withColumn("__df", F.count(F.lit(1)).over(w))
              .filter(F.col("__df") <= max_df)
              .drop("__df"))
    b = benchmark.select(
        F.col(id_col).alias("benchmark_id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("sh"))
    return (c.join(b, "sh")
             .filter(F.col("corpus_id") != F.col("benchmark_id"))
             .groupBy("corpus_id", "benchmark_id")
             .agg(F.count(F.lit(1)).alias("n_shared"))
             .filter(F.col("n_shared") >= min_overlap))


def stratified_sample(df: DataFrame, group_cols: list[str], key_col: str,
                      pct: int, salt: str = "") -> DataFrame:
    """EXACT pct% per stratum: rank rows inside each group by
    md5(salt || key) and keep ``ceil(pct/100 * group_size)``.

    `deterministic_sample` gives pct% only in expectation — small or
    skewed strata can land far off, which is exactly when stratification
    matters (balancing languages/sources in a training mix). Ranking
    by the key hash keeps the selection a pure function of (salt,
    key, stratum membership): engine-reproducible and stable under
    row order. One shuffle on the stratum key; both windows share
    that partitioning. Under corpus GROWTH a stratum's selection can
    change (the quota is a function of group size) — that's inherent
    to exact quotas; use `deterministic_sample` when growth-stability
    matters more than exactness.
    """
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w_rank = Window.partitionBy(*group_cols).orderBy(h, F.col(key_col))
    w_all = Window.partitionBy(*group_cols)
    return (df.withColumn("__r", F.row_number().over(w_rank))
              .withColumn("__n", F.count(F.lit(1)).over(w_all))
              .filter(F.col("__r") <=
                      F.ceil(F.col("__n") * pct / F.lit(100.0)))
              .drop("__r", "__n"))


def pack_token_chunks(df: DataFrame, group_cols: list[str],
                      token_count: Column, order_col: str = "doc_id",
                      budget: int = 2048) -> DataFrame:
    """Assign documents to fixed-token-budget chunks WITHIN each shard
    group: chunk_id = floor(exclusive-prefix-tokens / budget) in
    ``order_col`` order. Deterministic, and the window partitions by
    the shard key so packing parallelizes across groups instead of
    forcing a global sort."""
    w = (Window.partitionBy(*group_cols).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    before = F.coalesce(F.sum(token_count).over(w), F.lit(0))
    return df.withColumn("__tokens", token_count) \
             .withColumn("chunk_id", F.floor(before / budget)) \
             .withColumnRenamed("__tokens", "n_tokens")


def mixture_sample(df: DataFrame, group_col: str, weights: dict,
                   budget_frac: float, key_col: str = "doc_id",
                   salt: str = "mix", grain: int = 10000) -> DataFrame:
    """Deterministic mixture resampler: downsample each ``group_col``
    stratum toward a target data mixture (the DoReMi/Pile-style
    "mixture weights" step every pretraining corpus goes through).

    The total budget is ``floor(budget_frac * N)`` rows; stratum g
    gets ``target_g = budget * weights[g]`` of it, achieved by
    keeping rows whose :func:`hash_bucket` (grain buckets) falls
    under ``floor(grain * min(1, target_g / n_g))`` — a pure function
    of (salt, key, rate), so the sample is identical across runs,
    engines, and partitionings. Under corpus GROWTH the rates
    themselves move with the counts (inherent to quota sampling, same
    caveat as stratified_sample); at a fixed rate membership is
    hash-stable. A stratum smaller than its target is kept whole
    (rate capped at 1) rather than upsampled: repetition policy
    belongs to the training loader, not the corpus.

    Scale shape: ONE count aggregation (map-side combined, one row
    per stratum) broadcast back onto the scan — the filter itself is
    a zero-shuffle scan-stage predicate; no per-row state, no window.
    Groups absent from ``weights`` are dropped (weight 0)."""
    wmap = F.create_map(*[x for k, v in weights.items()
                          for x in (F.lit(k), F.lit(float(v)))])
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    tot = counts.agg(F.sum("__n").alias("__tot"))
    thr = (counts.crossJoin(F.broadcast(tot))
           .withColumn("__w", wmap[F.col(group_col)])
           .filter(F.col("__w").isNotNull())
           .withColumn(
               "__thr",
               F.floor(F.lit(float(grain)) * F.least(
                   F.lit(1.0),
                   F.floor(F.lit(float(budget_frac)) * F.col("__tot"))
                   * F.col("__w") / F.col("__n"))))
           .select(group_col, "__thr"))
    return (df.join(F.broadcast(thr), group_col)
              .filter(hash_bucket(F.col(key_col), salt, grain)
                      < F.col("__thr"))
              .drop("__thr"))


def snapshot_diff(old: DataFrame, new: DataFrame, key_col: str = "doc_id",
                  content_col: str = "text") -> DataFrame:
    """Row-level diff between two corpus snapshots by content hash:
    (key, status) with status in added | removed | changed |
    unchanged — the incremental-refresh primitive (what must re-embed,
    re-dedup, re-score after a crawl refresh; md5 comparison means
    text storage never ships through the join).

    Scale shape: each side reduces to (key, md5) IN THE SCAN STAGE,
    then ONE co-keyed full-outer shuffle join; at 100 TB both sides
    hash-partition on the key and the join carries 16-byte digests,
    not documents."""
    o = old.select(F.col(key_col).alias("__k"),
                   F.md5(F.coalesce(F.encode(content_col, "UTF-8"),
                                    F.lit(b""))).alias("__old_md5"))
    n = new.select(F.col(key_col).alias("__k"),
                   F.md5(F.coalesce(F.encode(content_col, "UTF-8"),
                                    F.lit(b""))).alias("__new_md5"))
    return (o.join(n, "__k", "full_outer")
            .select(F.col("__k").alias(key_col),
                    F.when(F.col("__old_md5").isNull(), "added")
                     .when(F.col("__new_md5").isNull(), "removed")
                     .when(F.col("__old_md5") != F.col("__new_md5"),
                           "changed")
                     .otherwise("unchanged").alias("status")))
