"""Iterative k-means over embedding columns — trains the centroids
the IVF index (operators/similarity.py) probes.

The canonical Spark iterative-algorithm shape: the small model state
(k centroid vectors) lives on the driver and is shipped to tasks in
the kernel closure each round; the corpus is never collected. Per
iteration, ONE narrow map over the corpus does both the nearest-
centroid assignment (batch matmul argmax — no cross join, no window
shuffle) and the per-cell partial sums (k x dim doubles per Arrow
batch); the only shuffled data is those partials, reduced by a tiny
groupBy. Per-iteration cost at 100 TB: one scan + a k*dim-row
shuffle.

Deterministic and oracle-reproducible: initial centroids are the k
lowest-id vectors; assignment rounds cosine to 6 dp and breaks ties
toward the lowest cell id; updated centroid coordinates are rounded
to 6 dp each round, which absorbs summation-order differences
(numpy/Spark partial-agg vs a SQL engine's fold) so the whole
training run is bit-reproducible in ANSI SQL — the DuckDB oracle
unrolls the same iterations. Training stops early when a round
leaves every (rounded) centroid unchanged.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _cosine_matrix, _nearest_cell


def _centroid_arrays(centroids: list[tuple[int, list[float]]]
                     ) -> tuple[np.ndarray, np.ndarray]:
    cell_ids = np.array([c for c, _ in centroids], dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for _, v in centroids])
    return cell_ids, mat


def _partial_sums(vectors: DataFrame, centroids: list[tuple[int, list[float]]],
                  id_col: str, vec_col: str) -> DataFrame:
    """(cell_id, psum array<double>, n) — one row per (Arrow batch,
    non-empty cell): assignment and partial aggregation fused in a
    single map-side pass."""
    cell_ids, cent_mat = _centroid_arrays(centroids)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            batch = np.stack(pdf[vec_col].map(
                lambda v: np.asarray(v, dtype=np.float64)).to_numpy())
            cells = _nearest_cell(batch, cent_mat, cell_ids)
            rows = []
            for cid in np.unique(cells):
                sel = batch[cells == cid]
                rows.append((int(cid), sel.sum(axis=0).tolist(), len(sel)))
            yield pd.DataFrame(rows, columns=["cell_id", "psum", "n"])

    return vectors.select(vec_col).mapInPandas(
        kernel, schema="cell_id long, psum array<double>, n long")


def kmeans_fit(vectors: DataFrame, k: int = 8, max_iter: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> list[tuple[int, list[float]]]:
    """Train k centroids; returns [(cell_id, centroid_vector)].

    Only k x dim floats ever reach the driver (the partial sums are
    reduced to k rows by a groupBy first); assignment and averaging
    stay distributed.
    """
    init = (vectors.orderBy(id_col).limit(k)
            .withColumn("cell_id",
                        F.row_number().over(Window.orderBy(id_col)) - 1)
            .select("cell_id", F.col(vec_col).alias("c")).collect())
    centroids = [(r["cell_id"], [round(float(x), 6) for x in r["c"]])
                 for r in init]

    for _ in range(max_iter):
        partials = _partial_sums(vectors, centroids, id_col, vec_col)
        # elementwise mean per cell: explode the k*batches partial
        # rows (NOT the corpus) -> groupBy(cell, i) with map-side
        # combine -> k rows of dim coordinates
        sums = (partials.select("cell_id", "n",
                                F.posexplode("psum").alias("i", "x"))
                .groupBy("cell_id", "i")
                .agg(F.sum("x").alias("s"), F.sum("n").alias("n")))
        rows = (sums.groupBy("cell_id")
                .agg(F.array_sort(F.collect_list(F.struct("i", "s", "n")))
                     .alias("parts"))
                .select("cell_id",
                        F.transform("parts", lambda p: F.round(p["s"] / p["n"], 6))
                        .alias("c"))
                .collect())
        new = {r["cell_id"]: [float(x) for x in r["c"]] for r in rows}
        # empty cells keep their previous centroid
        updated = [(cid, new.get(cid, c)) for cid, c in centroids]
        if updated == centroids:   # converged: rounded coords stable
            break
        centroids = updated
    return centroids


def kmeans_assignments(vectors: DataFrame, k: int = 8, max_iter: int = 5,
                       id_col: str = "vec_id", vec_col: str = "embedding"
                       ) -> DataFrame:
    """(id, cell_id, sim) for the trained model — the IVF index build
    output (partition the corpus by cell_id to serve ANN queries).
    Single narrow pass over the corpus; no shuffle."""
    centroids = kmeans_fit(vectors, k, max_iter, id_col, vec_col)
    cell_ids, cent_mat = _centroid_arrays(centroids)
    id_type = vectors.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            batch = np.stack(pdf[vec_col].map(
                lambda v: np.asarray(v, dtype=np.float64)).to_numpy())
            sims = _cosine_matrix(batch, cent_mat)
            best = np.argmax(sims, axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "cell_id": cell_ids[best],
                "sim": sims[np.arange(len(best)), best]})

    return vectors.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, cell_id long, sim double")
