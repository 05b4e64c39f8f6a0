"""Link-graph analysis over a deterministic host graph.

A crawl pipeline ranks hosts (spam scoring, crawl-frontier priority,
quality signals a la Common Crawl's harmonic-centrality lists) long
before any ML stage. The documents table carries no URL column, so
the graph is synthesized arithmetically from doc_id — every engine
derives the identical edge list, making the computation fully
oracle-checkable.

The PageRank here runs in EXACT INTEGER ARITHMETIC (rank mass in
units of 1e-12, integer division for the per-edge split, damping as
*85 // 100): double-precision PageRank sums incoming contributions
in shuffle order, which diverges in the last ulp across engines and
partitionings — the same class of bug as float SUM drift, solved the
same way as `sum_exact` (exact accumulation, convert to double only
at the output edge).

No counterpart in the reference (extension scope, SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .queries import query

_N_HOSTS = 97          # prime, so doc_id % 97 covers all residues
_UNIT = 10 ** 12       # rank mass granularity
_ITER = 3              # unrolled in the SQL oracle
# Rank rows are ~16 bytes each; above this host count a forced
# broadcast of the rank side risks executor OOM, so the join degrades
# to a shuffle join against the pre-partitioned edge set instead.
_BROADCAST_HOST_LIMIT = 2_000_000


def _pr_iter_sql(prev: str, k: int) -> str:
    """One unrolled integer-PageRank iteration as a CTE body."""
    return f"""
    contrib{k} AS (
      SELECT e.dst AS host,
             SUM(p.pr * e.w // e.outdeg) AS m
      FROM edges e JOIN {prev} p ON p.host = e.src
      GROUP BY e.dst
    ),
    it{k} AS (
      SELECT n.host,
             (15 * {_UNIT} // (100 * n.n_hosts))
             + (85 * COALESCE(c.m, 0) // 100) AS pr,
             n.n_hosts
      FROM nodes n LEFT JOIN contrib{k} c ON n.host = c.host
    )"""


@query(
    "web_link_pagerank",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id % {_N_HOSTS} AS src,
             (doc_id * 31 + 7) % {_N_HOSTS} AS dst
      FROM documents
    ),
    edges0 AS (
      SELECT src, dst, COUNT(*) AS w FROM raw
      WHERE src <> dst GROUP BY src, dst
    ),
    outdegs AS (
      SELECT src, SUM(w) AS outdeg FROM edges0 GROUP BY src
    ),
    edges AS (
      SELECT e.src, e.dst, e.w, o.outdeg
      FROM edges0 e JOIN outdegs o ON e.src = o.src
    ),
    hosts AS (
      SELECT src AS host FROM edges0
      UNION SELECT dst FROM edges0
    ),
    nodes AS (
      SELECT host, (SELECT COUNT(*) FROM hosts) AS n_hosts FROM hosts
    ),
    it0 AS (
      SELECT host, {_UNIT} // n_hosts AS pr, n_hosts FROM nodes
    ),{','.join(_pr_iter_sql(f'it{k - 1}', k) for k in range(1, _ITER + 1))}
    SELECT host,
           CAST(pr AS BIGINT) AS pr_units,
           CAST(pr AS DOUBLE) / {_UNIT} AS pagerank
    FROM it{_ITER}
    """,
)
def _web_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level PageRank ({_ITER} damped power iterations) over the
    deterministic doc_id-derived host graph. Each iteration is one
    equi-join (ranks x edges on src) plus one map-side-combined SUM
    on dst — the canonical iterative-join workload. Exact integer
    arithmetic end to end (see module docstring), so the oracle's
    unrolled CTEs reproduce every unit of rank mass; doubles appear
    only in the final output column.

    Scale shape: the edge list is grouped once up front (one shuffle)
    and reused by every iteration; per iteration the rank side is one
    row per host — at web scale that is millions of rows against
    billions of edges. Below `_BROADCAST_HOST_LIMIT` hosts the rank
    side broadcasts into the edge partitioning; above it the hint is
    withheld and the edge set is pre-partitioned on `src` before its
    checkpoint, so every iteration's shuffle join reuses that
    partitioning and only the small rank side moves — graceful
    degradation instead of a forced-broadcast OOM. Both iterated
    inputs use localCheckpoint (not persist) so repeated invocations
    leave nothing pinned in executor storage. No collect, no
    driver-side loop state beyond the plan itself."""
    docs = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % _N_HOSTS).alias("src"),
        ((F.col("doc_id") * 31 + 7) % _N_HOSTS).alias("dst"))
    edges0 = (docs.filter(F.col("src") != F.col("dst"))
              .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w")))
    outdegs = edges0.groupBy("src").agg(F.sum("w").alias("outdeg"))
    hosts = (edges0.select(F.col("src").alias("host"))
             .union(edges0.select(F.col("dst").alias("host")))
             .distinct())
    # both sides re-enter the plan every iteration: checkpoint them so
    # the distinct-union and the edge grouping run once, not per
    # iteration (blocks are ContextCleaner-freed when the result frame
    # is dropped — persist() would pin a CacheManager entry for the
    # life of the session)
    nodes = hosts.crossJoin(
        F.broadcast(hosts.agg(F.count(F.lit(1)).alias("n_hosts"))))
    nodes = nodes.localCheckpoint(eager=True)
    n_hosts = nodes.count()
    broadcastable = n_hosts <= _BROADCAST_HOST_LIMIT
    edges = edges0.join(outdegs, "src")
    if not broadcastable:
        edges = edges.repartition("src")
    edges = edges.localCheckpoint(eager=True)
    ranks = nodes.select(
        "host", F.expr(f"{_UNIT} DIV n_hosts").alias("pr"), "n_hosts")
    for _ in range(_ITER):
        rank_side = ranks.select(F.col("host").alias("src"), "pr")
        if broadcastable:
            rank_side = F.broadcast(rank_side)
        contrib = (edges.join(rank_side, "src")
            .select("dst", F.expr("pr * w DIV outdeg").alias("m"))
            .groupBy("dst").agg(F.sum("m").alias("m")))
        ranks = (nodes.join(
            contrib.withColumnRenamed("dst", "host"), "host", "left")
            .select(
                "host",
                (F.expr(f"15 * {_UNIT} DIV (100 * n_hosts)")
                 + F.expr("85 * COALESCE(m, 0) DIV 100")).alias("pr"),
                "n_hosts"))
    return ranks.select(
        "host",
        F.col("pr").cast("long").alias("pr_units"),
        (F.col("pr").cast("double") / _UNIT).alias("pagerank"))


@query(
    "web_triangle_count",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id % {_N_HOSTS} AS src,
             (doc_id * 31 + 7) % {_N_HOSTS} AS dst
      FROM documents
      UNION ALL
      SELECT doc_id % {_N_HOSTS},
             (doc_id * 17 + 3) % {_N_HOSTS}
      FROM documents
    ),
    und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM raw WHERE src <> dst
    ),
    deg AS (
      SELECT host, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS host FROM und UNION ALL SELECT b FROM und
      ) GROUP BY 1
    ),
    oriented AS (
      -- orient each edge from the lower-(degree, id) endpoint: the
      -- classic wedge-bounding trick, deterministic so both engines
      -- derive the identical DAG; dv = the head's degree, carried so
      -- the wedge dedup below can stay in (degree, id) order
      SELECT CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.a ELSE u.b END AS u,
             CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.b ELSE u.a END AS v,
             CASE WHEN (da.d, u.a) < (db.d, u.b) THEN db.d ELSE da.d END AS dv
      FROM und u
      JOIN deg da ON da.host = u.a
      JOIN deg db ON db.host = u.b
    ),
    tri AS (
      -- each wedge pair once, ordered by the SAME (degree, id) key the
      -- orientation used, so the closing edge between y and z is
      -- guaranteed to be oriented y -> z and ONE probe finds it; a raw
      -- id-order dedup here would probe the wrong direction whenever
      -- (degree, id) order disagrees with id order and miss triangles
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM oriented e1
      JOIN oriented e2 ON e2.u = e1.u
       AND (e2.dv > e1.dv OR (e2.dv = e1.dv AND e2.v > e1.v))
      JOIN oriented e3 ON e3.u = e1.v AND e3.v = e2.v
    ),
    per_host AS (
      SELECT host, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT x AS host FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY 1
    )
    SELECT d.host, d.d AS degree,
           COALESCE(p.n_triangles, 0) AS n_triangles,
           CASE WHEN d.d >= 2 THEN
             CAST(2 * COALESCE(p.n_triangles, 0) AS DOUBLE)
             / CAST(d.d * (d.d - 1) AS DOUBLE)
           ELSE 0.0 END AS clustering_coef
    FROM deg d LEFT JOIN per_host p USING (host)
    """,
)
def _web_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host triangle participation + local clustering coefficient
    over the undirected host graph — the spam-farm / link-ring signal
    a crawl pipeline computes next to PageRank. Implemented with the
    DEGREE-ORDERED orientation (count every triangle exactly once
    from its lowest-degree vertex): each undirected edge becomes a
    directed edge from the lower (degree, id) endpoint, which bounds
    any vertex's out-wedge fan to O(sqrt(m)) regardless of skew — a
    hub of degree D costs D wedges, not D^2, which is the difference
    between finishing and not finishing on a power-law web graph at
    100 TB. The orientation is deterministic, so the oracle derives
    the identical DAG and the whole computation full-hash-checks.

    Plan: edge distinct + degree agg shuffle host-sized rows; the
    wedge self-join and the closing-edge join shuffle on the wedge
    pivot/endpoints (AQE broadcasts the 2-col edge set when small);
    the clustering coefficient is one exact-integer IEEE division."""
    docs = load_table(spark, sf_dir, "documents")
    raw = (docs.select(
               (F.col("doc_id") % _N_HOSTS).alias("src"),
               ((F.col("doc_id") * 31 + 7) % _N_HOSTS).alias("dst"))
           .unionAll(docs.select(
               (F.col("doc_id") % _N_HOSTS).alias("src"),
               ((F.col("doc_id") * 17 + 3) % _N_HOSTS).alias("dst"))))
    und = (raw.filter(F.col("src") != F.col("dst"))
              .select(F.least("src", "dst").alias("a"),
                      F.greatest("src", "dst").alias("b"))
              .distinct())
    return triangle_stats(und)


def triangle_stats(und: DataFrame) -> DataFrame:
    """Degree-ordered triangle enumeration over a distinct undirected
    edge set (columns `a` < `b`); returns one row per host with
    (host, degree, n_triangles, clustering_coef).

    Every ordering decision — edge orientation, wedge-pair dedup, and
    the closing-edge probe direction — uses the SAME (degree, id) key.
    Mixing key spaces (orient by (degree, id) but dedup wedges by raw
    id) silently drops any triangle where the two orders disagree;
    property-tested against a brute-force counter on random graphs in
    tests/test_graph.py."""
    deg = (und.select(F.col("a").alias("host"))
              .unionAll(und.select(F.col("b").alias("host")))
              .groupBy("host")
              .agg(F.count(F.lit(1)).cast("long").alias("d"))
              .localCheckpoint(eager=True))  # reused by orientation
                                             # AND the final rollup
    lower = ((F.col("da") < F.col("db"))
             | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))))
    oriented = (und
                .join(deg.select(F.col("host").alias("a"),
                                 F.col("d").alias("da")), "a")
                .join(deg.select(F.col("host").alias("b"),
                                 F.col("d").alias("db")), "b")
                .select(F.when(lower, F.col("a")).otherwise(F.col("b"))
                         .alias("u"),
                        F.when(lower, F.col("b")).otherwise(F.col("a"))
                         .alias("v"),
                        # head's degree: kept so wedge dedup stays in
                        # (degree, id) order — see docstring
                        F.when(lower, F.col("db")).otherwise(F.col("da"))
                         .alias("dv")))
    # the oriented edge set feeds THREE join legs; without a lineage
    # cut each leg re-derives the distinct+degree+orientation chain
    # from the scan (measured 67 exchanges in the audited plan) —
    # checkpoint once, reuse thrice (the PageRank house pattern)
    oriented = oriented.localCheckpoint(eager=True)
    e1 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"),
                         F.col("dv").alias("dy"))
    e2 = oriented.select(F.col("u").alias("x"), F.col("v").alias("z"),
                         F.col("dv").alias("dz"))
    e3 = oriented.select(F.col("u").alias("y"), F.col("v").alias("z"))
    # wedge pair dedup in (degree, id) order: y is then the lower
    # (degree, id) endpoint, so the closing edge is oriented y -> z
    # and the single equi-join probe below is guaranteed to find it
    tri = (e1.join(e2, "x")
             .filter(F.struct("dz", "z") > F.struct("dy", "y"))
             .join(e3, ["y", "z"]))
    per_host = (tri.select(F.col("x").alias("host"))
                   .unionAll(tri.select(F.col("y").alias("host")))
                   .unionAll(tri.select(F.col("z").alias("host")))
                   .groupBy("host")
                   .agg(F.count(F.lit(1)).cast("long")
                         .alias("n_triangles")))
    return (deg.join(per_host, "host", "left")
               .select("host", F.col("d").alias("degree"),
                       F.coalesce("n_triangles", F.lit(0)).cast("long")
                        .alias("n_triangles"),
                       F.when(F.col("d") >= 2,
                              (2 * F.coalesce("n_triangles", F.lit(0)))
                              .cast("double")
                              / (F.col("d") * (F.col("d") - 1))
                              .cast("double"))
                        .otherwise(F.lit(0.0))
                        .alias("clustering_coef")))
