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


#: Driver-path cutover for kmeans_fit: a training set at or below
#: this row count is collected once and iterated driver-side (one job
#: total instead of 2 jobs per iteration). 65536 x 64 doubles is
#: ~32 MB — bounded driver use (guide §5), the same row-count-derived
#: cutover as the BPE merge loop; larger sets keep the distributed
#: rounds untouched.
DRIVER_FIT_MAX = 65536


def _round_half_up6(x: float) -> float:
    """Exactly Spark's round(double, 6): BigDecimal.valueOf (shortest
    decimal repr, which is what Python's repr gives too) -> setScale(6,
    HALF_UP) -> toDouble. Python's round() is half-EVEN, so it cannot
    be used here."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _kmeans_fit_driver(rows, k: int, max_iter: int
                       ) -> list[tuple[int, list[float]]]:
    """Driver-side twin of the distributed loop below: identical init
    (k lowest-id vectors), identical assignment kernel
    (_nearest_cell: cosine rounded to 6 dp, ties to the lowest cell),
    identical update (per-cell mean rounded to 6 dp HALF_UP — the
    rounding that makes the whole recipe summation-order-insensitive,
    which is also why the DuckDB oracle can replay it), identical
    early stop. Pinned equal to the distributed path by
    tests/test_kmeans.py::test_driver_and_distributed_fit_agree."""
    rows = sorted(rows, key=lambda r: r[0])
    centroids = [(i, [round(float(x), 6) for x in rows[i][1]])
                 for i in range(min(k, len(rows)))]
    if not rows:
        return centroids
    batch = np.stack([np.asarray(v, dtype=np.float64) for _, v in rows])
    for _ in range(max_iter):
        cell_ids, cent_mat = _centroid_arrays(centroids)
        cells = _nearest_cell(batch, cent_mat, cell_ids)
        new = {}
        for cid in np.unique(cells):
            sel = batch[cells == cid]
            mean = sel.sum(axis=0) / len(sel)
            new[int(cid)] = [_round_half_up6(x) for x in mean]
        updated = [(cid, new.get(cid, c)) for cid, c in centroids]
        if updated == centroids:
            break
        centroids = updated
    return centroids


def kmeans_fit(vectors: DataFrame, k: int = 8, max_iter: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> list[tuple[int, list[float]]]:
    """Train k centroids; returns [(cell_id, centroid_vector)].

    Only k x dim floats ever reach the driver (the partial sums are
    reduced to k rows by a groupBy first); assignment and averaging
    stay distributed — except when the training set itself is small
    enough to collect (<= DRIVER_FIT_MAX rows, probed with a
    limit-bounded collect), where the per-iteration job pair is pure
    scheduling overhead and the identical loop runs driver-side.
    """
    probe = (vectors.select(id_col, vec_col)
             .limit(DRIVER_FIT_MAX + 1).collect())
    if len(probe) <= DRIVER_FIT_MAX:
        return _kmeans_fit_driver(
            [(r[0], r[1]) for r in probe], k, max_iter)

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
