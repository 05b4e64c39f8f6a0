"""Iterative k-means over embedding columns — trains the centroids
the IVF index (operators/similarity.py) probes.

The canonical Spark iterative-algorithm shape: the small model state
(k centroid vectors) lives on the driver and is broadcast each
round; the corpus is never collected. Per iteration: one narrow map
(nearest centroid via the broadcast) + one groupBy(cell) average —
a single shuffle of partial sums, the same cost profile at 100 TB
(per-iteration cost is one scan + one tiny shuffle).

Deterministic: initial centroids are the k lowest-id vectors and
ties break by cell id, so training is reproducible run-to-run —
required for any result the driver hash-compares downstream.
Non-SQL-expressible (unbounded iteration) => exposed as a rows-only
query, per the driver contract's weaker check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import cosine


def kmeans_fit(vectors: DataFrame, k: int = 8, max_iter: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> list[tuple[int, list[float]]]:
    """Train k centroids; returns [(cell_id, centroid_vector)].

    Only the k centroids ever reach the driver (k * dim floats);
    assignment and averaging stay distributed.
    """
    spark = vectors.sparkSession
    w = Window.orderBy(id_col)
    init = (vectors.orderBy(id_col).limit(k)
            .withColumn("cell_id", F.row_number().over(w) - 1)
            .select("cell_id", F.col(vec_col).alias("c")).collect())
    centroids = [(r["cell_id"], list(r["c"])) for r in init]

    dim = len(centroids[0][1])
    for _ in range(max_iter):
        cent_df = F.broadcast(spark.createDataFrame(
            centroids, f"cell_id int, c array<float>"))
        assigned = (vectors.crossJoin(cent_df)
                    .withColumn("sim", cosine(F.col(vec_col), F.col("c"))))
        best = Window.partitionBy(id_col).orderBy(
            F.col("sim").desc(), F.col("cell_id").asc())
        cells = (assigned.withColumn("__r", F.row_number().over(best))
                 .filter(F.col("__r") == 1)
                 .select("cell_id", vec_col))
        # mean vector per cell: elementwise sums via posexplode —
        # map-side combine keeps the shuffle at k*dim partial sums
        sums = (cells.select("cell_id",
                             F.posexplode(F.col(vec_col)).alias("i", "x"))
                .groupBy("cell_id", "i")
                .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")))
        rows = (sums.groupBy("cell_id")
                .agg(F.array_sort(F.collect_list(F.struct("i", "s", "n")))
                     .alias("parts"))
                .select("cell_id",
                        F.transform("parts", lambda p: p["s"] / p["n"])
                        .alias("c"))
                .collect())
        new = {r["cell_id"]: [float(x) for x in r["c"]] for r in rows}
        # empty cells keep their previous centroid
        centroids = [(cid, new.get(cid, c)) for cid, c in centroids]
        if all(len(c) == dim for _, c in centroids):
            pass
    return centroids


def kmeans_assignments(vectors: DataFrame, k: int = 8, max_iter: int = 5,
                       id_col: str = "vec_id", vec_col: str = "embedding"
                       ) -> DataFrame:
    """(id, cell_id, sim) for the trained model — the IVF index build
    output (partition the corpus by cell_id to serve ANN queries)."""
    spark = vectors.sparkSession
    centroids = kmeans_fit(vectors, k, max_iter, id_col, vec_col)
    cent_df = F.broadcast(spark.createDataFrame(
        centroids, "cell_id int, c array<float>"))
    assigned = (vectors.crossJoin(cent_df)
                .withColumn("sim", F.round(cosine(F.col(vec_col), F.col("c")), 6)))
    best = Window.partitionBy(id_col).orderBy(
        F.col("sim").desc(), F.col("cell_id").asc())
    return (assigned.withColumn("__r", F.row_number().over(best))
            .filter(F.col("__r") == 1)
            .select(id_col, "cell_id", "sim"))
