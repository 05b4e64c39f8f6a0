"""Served-ANN-index query with a full DuckDB oracle.

``ann_index_topk`` exercises the materialized IVF path end-to-end:
k-means training (8 cells, 3 iterations) -> cell-partitioned parquet
index -> nprobe=2 partition-pruned top-3 query. The index is built
once per (process, sf_dir) under /tmp and reused — exactly the
amortization a served system provides; the oracle replays training
via the unrolled k-means CTEs (plans/sketch_queries.kmeans_ctes) and
the probe/scan arithmetic in plain SQL, so the result is fully
hash-checked despite the iterative build.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ann_index import build_ann_index, query_ann
from ..sources.parquet import load_table
from .queries import query
from .similarity_queries import _N_QUERIES, _cos
from .sketch_queries import _ITERS, _K, kmeans_ctes

_NPROBE = 2
_TOPK = 3

_INDEX_CACHE: dict[str, str] = {}


def ann_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process+dataset) and return the index path."""
    from ..operators.ann_index import index_ok

    cached = _INDEX_CACHE.get(sf_dir)
    if cached is None or not index_ok(cached):
        slug = re.sub(r"[^A-Za-z0-9.]+", "_", sf_dir.strip("/"))
        path = os.path.join(tempfile.gettempdir(), f"ann_index_{slug}")
        if not index_ok(path):
            # absent OR half-written by a crashed process: rebuild
            # (the atomic build replaces any poisoned remains)
            emb = load_table(spark, sf_dir, "embeddings")
            build_ann_index(emb, path, k_cells=_K, max_iter=_ITERS)
        _INDEX_CACHE[sf_dir] = path
    return _INDEX_CACHE[sf_dir]


@query(
    "ann_index_topk",
    oracle=f"""
    WITH {kmeans_ctes(_K, _ITERS)},
    assigned AS (
      SELECT vec_id, embedding, cell_id FROM (
        SELECT e.vec_id, e.embedding, c.cell_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY round({_cos('e.embedding', 'c.c')}, 6) DESC,
                                           c.cell_id ASC) AS r
        FROM e CROSS JOIN c{_ITERS} c
      ) WHERE r = 1
    ),
    qprobe AS (
      SELECT vec_id AS query_id, embedding AS q_vec, cell_id FROM (
        SELECT e.vec_id, e.embedding, c.cell_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY round({_cos('e.embedding', 'c.c')}, 6) DESC,
                                           c.cell_id ASC) AS r
        FROM e CROSS JOIN c{_ITERS} c
        WHERE e.vec_id < {_N_QUERIES}
      ) WHERE r <= {_NPROBE}
    ),
    sims AS (
      SELECT q.query_id, a.vec_id AS neighbor_id,
             round({_cos('q.q_vec', 'a.embedding')}, 6) AS sim
      FROM assigned a JOIN qprobe q ON a.cell_id = q.cell_id
      WHERE a.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, sim, rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id ASC) AS rnk
      FROM sims
    ) WHERE rnk <= {_TOPK}
    """,
)
def _ann_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ann_index_path(spark, sf_dir)
    queries_df = load_table(spark, sf_dir, "embeddings") \
        .filter(F.col("vec_id") < _N_QUERIES)
    return query_ann(spark, path, queries_df, k=_TOPK, nprobe=_NPROBE) \
        .withColumnRenamed("rank", "rnk")
