"""Property tests for the degree-ordered triangle enumeration.

The r9 advisory: orientation by (degree, id) combined with a raw-id
wedge dedup and a single-direction closing-edge probe misses every
triangle where the two orders disagree — and the shared-flaw oracle
plus a triangle-free synthetic graph masked it. These tests pin the
fix against an independent brute-force counter on random graphs,
where id order and degree order disagree constantly.
"""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_precisely_demo_spark.plans.graph_queries import triangle_stats


def _brute_force(edges):
    """O(n^3) reference: per-host triangle count + clustering coef."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    per = {h: 0 for h in adj}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            per[x] += 1
            per[y] += 1
            per[z] += 1
    out = {}
    for h, nbrs in adj.items():
        d = len(nbrs)
        cc = (2.0 * per[h] / (d * (d - 1))) if d >= 2 else 0.0
        out[h] = (d, per[h], cc)
    return out


def _run(spark, edges):
    schema = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.LongType()),
    ])
    und = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], schema).distinct()
    rows = triangle_stats(und).collect()
    return {r.host: (r.degree, r.n_triangles, r.clustering_coef)
            for r in rows}


def test_triangle_stats_random_graphs(spark):
    """Random graphs where degree order and id order disagree: the
    Spark rollup must equal the brute-force counter exactly (the bug
    this pins dropped triangles on ~2/3 of random graphs)."""
    rng = random.Random(20260815)
    for _ in range(4):
        n = rng.randint(6, 14)
        edges = set()
        for _ in range(rng.randint(n, 3 * n)):
            a, b = rng.sample(range(n), 2)
            edges.add((min(a, b), max(a, b)))
        expect = _brute_force(edges)
        got = _run(spark, edges)
        assert got == expect


def test_triangle_stats_known_shapes(spark):
    """K4 has 4 triangles, every host in 3 of them, clustering 1.0;
    hanging a pendant off one vertex adds no triangles but drops that
    vertex's coefficient."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _run(spark, k4)
    assert got == {h: (3, 3, 1.0) for h in range(4)}

    got = _run(spark, k4 + [(3, 9)])
    assert got[9] == (1, 0, 0.0)
    assert got[3] == (4, 3, 0.5)
    for h in range(3):
        assert got[h] == (3, 3, 1.0)


def test_triangle_query_graph_is_not_triangle_free(spark):
    """The doc_id-derived host graph must contain triangles, or the
    oracle parity check is vacuous for the counting logic (exactly
    how the r9 bug survived)."""
    from flink_precisely_demo_spark.plans.queries import QUERIES
    df = QUERIES["web_triangle_count"](spark, "/root/testdata/sf0.001")
    total = df.agg(F.sum("n_triangles")).collect()[0][0]
    assert total > 0
