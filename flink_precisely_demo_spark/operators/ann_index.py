"""Materialized IVF ANN index: build once, query many times.

The inline ``ivf_topk`` (operators/similarity.py) re-assigns the
corpus to cells on every call — right for ad-hoc queries, wasteful
for a served system. This module materializes the assignment:

- ``build_ann_index``: train k-means centroids (operators/kmeans.py),
  assign every corpus vector map-side, and write the corpus as
  parquet **partitioned by cell_id** plus a tiny ``centroids``
  parquet. At 100 TB the build is one training scan per iteration +
  one assignment scan + a partitioned write; no corpus shuffle
  beyond the write's own partitioning.
- ``query_ann``: resolve each query's top-``nprobe`` cells on the
  driver (q x k sims against the collected centroid matrix), then
  scan ONLY those cell partitions — ``cell_id IN (...)`` on a
  partition column is directory-level pruning, so a 1000-executor
  cluster reads ~nprobe/k_cells of the corpus bytes. Candidate
  scoring reuses the local-top-k kernel shape from similarity.py:
  per-partition batch matmul + local top-k, one tiny global window.

Recall/cost knob: nprobe=1 is fastest; nprobe=k_cells degenerates to
exact brute force over a partitioned scan (tested equivalence).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .kmeans import _centroid_arrays, kmeans_fit
from .similarity import (
    _cosine_matrix,
    _global_topk,
    _local_topk,
    _nearest_cell,
    collect_vectors,
)


def build_ann_index(corpus: DataFrame, index_path: str, k_cells: int = 8,
                    max_iter: int = 3, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Train centroids and materialize the cell-partitioned corpus at
    ``index_path`` (subdirs ``vectors/cell_id=N/`` and ``centroids``).

    The build is ATOMIC at the index level: everything writes to a
    UNIQUE ``<index_path>.build-<pid>-<nonce>`` dir (so concurrent
    builders never clobber each other mid-write) and publishes only
    after the ``_INDEX_OK`` marker is written, by renaming any old
    index aside first and the new dir into place — two renames, so a
    reader's window of "no index present" is the instant between
    them, not the length of an rmtree. A crashed build leaves a stale
    ``.build-*`` dir (reaped on the next attempt once its pid is
    dead), never a half-written index a reader could mistake for a
    real one — the serve path (:func:`index_ok`) accepts only
    marker-bearing dirs. On an object store the production analogue
    is a versioned prefix plus a pointer flip; same invariant,
    different rename."""
    import os
    import shutil
    import uuid

    spark = corpus.sparkSession
    # reap stale build/old dirs whose owning process is gone; live
    # pids are left alone so concurrent builds can't destroy each other
    parent, base = os.path.split(os.path.abspath(index_path))
    for name in os.listdir(parent) if os.path.isdir(parent) else []:
        for tag in (".build-", ".old-"):
            if name.startswith(base + tag):
                try:
                    pid = int(name[len(base + tag):].split("-")[0])
                    os.kill(pid, 0)
                except (ValueError, ProcessLookupError):
                    shutil.rmtree(os.path.join(parent, name),
                                  ignore_errors=True)
                except PermissionError:
                    pass                    # pid alive, not ours
    nonce = f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
    build_path = f"{index_path}.build-{nonce}"
    final_path, index_path = index_path, build_path
    centroids = kmeans_fit(corpus, k_cells, max_iter, id_col, vec_col)
    cell_ids, cent_mat = _centroid_arrays(centroids)
    id_type = corpus.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            batch = np.stack(pdf[vec_col].map(
                lambda v: np.asarray(v, dtype=np.float64)).to_numpy())
            out = pdf[[id_col, vec_col]].copy()
            out["cell_id"] = _nearest_cell(batch, cent_mat, cell_ids)
            yield out

    assigned = corpus.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, {vec_col} array<float>, cell_id long")
    assigned.write.mode("overwrite").partitionBy("cell_id") \
        .parquet(f"{index_path}/vectors")
    spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in centroids],
        "cell_id long, c array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/centroids")
    with open(os.path.join(index_path, "_INDEX_OK"), "w") as f:
        f.write("ok\n")
    # publish: swing the old index aside (rename, not rmtree — the
    # no-index window is one rename pair, not a recursive delete),
    # then the new one into place; reclaim the old dir afterwards
    old_path = f"{final_path}.old-{nonce}"
    try:
        os.rename(final_path, old_path)
    except FileNotFoundError:
        old_path = None                     # first build: nothing to swap
    os.rename(index_path, final_path)
    if old_path is not None:
        shutil.rmtree(old_path, ignore_errors=True)


def index_ok(index_path: str) -> bool:
    """True only for a completely-built index (marker present)."""
    import os

    return os.path.isfile(os.path.join(index_path, "_INDEX_OK"))


def load_centroids(spark: SparkSession, index_path: str
                   ) -> tuple[np.ndarray, np.ndarray]:
    rows = spark.read.parquet(f"{index_path}/centroids").collect()
    rows.sort(key=lambda r: r["cell_id"])
    return (np.array([r["cell_id"] for r in rows], dtype=np.int64),
            np.stack([np.asarray(r["c"], dtype=np.float64) for r in rows]))


def _probe_cells(q_mat: np.ndarray, cent_mat: np.ndarray,
                 cell_ids: np.ndarray, nprobe: int) -> list[np.ndarray]:
    """Top-``nprobe`` cells per query (sim desc, cell_id asc)."""
    sims = _cosine_matrix(q_mat, cent_mat)
    out = []
    for j in range(len(q_mat)):
        order = np.lexsort((cell_ids, -sims[j]))[:nprobe]
        out.append(cell_ids[order])
    return out


def query_ann(spark: SparkSession, index_path: str, queries: DataFrame,
              k: int = 3, nprobe: int = 2, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Top-k neighbors from the prebuilt index, scanning only the
    ``nprobe`` best cells per query: (query_id, neighbor_id, sim, rank)."""
    cell_ids, cent_mat = load_centroids(spark, index_path)
    query_ids, q_mat = collect_vectors(queries, id_col, vec_col)
    probes = _probe_cells(q_mat, cent_mat, cell_ids, nprobe)
    needed = sorted({int(c) for p in probes for c in p})
    # (q x cells) membership mask, indexed by position in `needed`
    probe_mask = {qid: set(int(c) for c in p)
                  for qid, p in zip(query_ids, probes)}

    vectors = (spark.read.parquet(f"{index_path}/vectors")
               # partition-column filter => directory pruning: only the
               # probed cells' files are ever listed/read
               .filter(F.col("cell_id").isin(needed))
               .select(id_col, vec_col, F.col("cell_id").cast("long")))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            batch = np.stack(pdf[vec_col].map(
                lambda v: np.asarray(v, dtype=np.float64)).to_numpy())
            nids = pdf[id_col].to_numpy(dtype=np.int64)
            cells = pdf["cell_id"].to_numpy(dtype=np.int64)
            mask = np.column_stack([
                np.isin(cells, list(probe_mask[qid])) for qid in query_ids])
            if not mask.any():
                continue
            sims = _cosine_matrix(batch, q_mat)
            yield _local_topk(sims, nids, query_ids, k, mask=mask)

    local = vectors.mapInPandas(
        kernel, schema="query_id long, neighbor_id long, sim double")
    return _global_topk(local, k)
