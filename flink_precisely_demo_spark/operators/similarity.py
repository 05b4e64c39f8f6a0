"""Similarity search over embedding columns (SURVEY.md §2.3).

Embeddings are ``array<float>`` columns; all arithmetic is JVM-side
(`zip_with` + `aggregate` fold — sequential left-to-right double
accumulation, deterministic and reproducible across engines).

Two paths:
- brute_force_topk: exact cosine top-k. The query set is broadcast
  (it is small by construction); similarity is computed inside the
  candidate scan stage, and per-query top-k uses a rank window that
  Spark's WindowGroupLimit optimization turns into partial top-k
  before the shuffle — the scalable exact baseline.
- ivf_topk: IVF-style pruning with deterministic centroids: every
  vector is assigned to its nearest centroid (argmin over a small
  broadcast centroid set); a query only scans candidates in its own
  cell (nprobe=1). At 100 TB this cuts the scanned fraction to
  ~1/n_cells; the cell assignment doubles as a partitioning key.

Determinism note: ranking uses (rounded similarity, candidate id) as
the sort key. Rounding to 6 dp absorbs any sub-ulp engine difference
in double summation; the id tiebreak makes equal-sim orders total.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _fan_out(df: DataFrame, key: str) -> DataFrame:
    """Spread the candidate corpus across cores before the per-row
    cosine arithmetic — a single-file scan otherwise serializes the
    CPU-bound vector math on one task."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, key)


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a: Column, b: Column) -> Column:
    """Pure-expression cosine — the semantic spec mirrored by the
    DuckDB oracles (sequential left-to-right double accumulation)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


_COSINE_UDF = None


def _cosine_pandas_udf():
    """Arrow-vectorized cosine (lazy: pandas_udf registration needs an
    active session, so it cannot run at import time). numpy's
    pairwise-summed dot differs from the sequential fold only at
    ~1e-15 relative — invisible after the 6-dp rounding every
    consumer applies before comparing or ranking
    (P(flip) ~ err/granularity ~ 1e-9 per value)."""
    global _COSINE_UDF
    if _COSINE_UDF is None:
        def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
            import numpy as np
            va = np.stack(a.to_numpy()).astype(np.float64)
            vb = np.stack(b.to_numpy()).astype(np.float64)
            num = (va * vb).sum(axis=1)
            den = (np.sqrt((va * va).sum(axis=1))
                   * np.sqrt((vb * vb).sum(axis=1)))
            return pd.Series(num / den)
        _COSINE_UDF = F.pandas_udf(_cos, "double")
    return _COSINE_UDF


def cosine(a: Column, b: Column) -> Column:
    """Default cosine: Arrow-vectorized (Spark's array higher-order
    lambdas are CodegenFallback — interpreted row-at-a-time — so the
    pandas path is ~10x faster on wide vectors; see BASELINE.md)."""
    return _cosine_pandas_udf()(a, b)


def brute_force_topk(candidates: DataFrame, queries: DataFrame, k: int = 3,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, sim, rank).

    Self-matches are excluded. ``queries`` must be small enough to
    broadcast (it is the probe set, not the corpus).
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    c = _fan_out(candidates, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    sims = (c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
             .withColumn("sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (sims.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "sim", "rank"))


def assign_cells(vectors: DataFrame, centroids: DataFrame,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF cell assignment: nearest centroid by cosine (argmax sim,
    centroid id as tiebreak). Centroids are broadcast; assignment is
    a narrow map over the corpus — no shuffle."""
    cent = centroids.select(F.col(id_col).alias("cell_id"),
                            F.col(vec_col).alias("cent_vec"))
    sims = _fan_out(vectors, id_col).join(F.broadcast(cent), how="cross").withColumn(
        "cent_sim", F.round(cosine(F.col(vec_col), F.col("cent_vec")), 6))
    w = Window.partitionBy(id_col).orderBy(
        F.col("cent_sim").desc(), F.col("cell_id").asc())
    return (sims.withColumn("__r", F.row_number().over(w))
                .filter(F.col("__r") == 1)
                .select(id_col, vec_col, "cell_id"))


def ivf_topk(candidates: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: int = 3, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF(nprobe=1) approximate top-k: searches only the query's own
    cell. Returns (query_id, neighbor_id, sim, rank).

    The corpus-side cell assignment is the expensive pass (the query
    probe set is tiny); a served ANN index materializes that
    assignment once (partitioned by cell) and amortizes it across
    queries — here it is computed inline because each call is a
    standalone query.
    """
    cand_cells = assign_cells(candidates, centroids, id_col, vec_col)
    query_cells = assign_cells(queries, centroids, id_col, vec_col)
    q = query_cells.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("q_vec"), "cell_id")
    c = cand_cells.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("c_vec"), "cell_id")
    sims = (c.join(F.broadcast(q), "cell_id")
             .filter(F.col("query_id") != F.col("neighbor_id"))
             .withColumn("sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (sims.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "sim", "rank"))
