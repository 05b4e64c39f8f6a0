"""Adversarial-input bounds for the pair-emitting dedup operators.

The LSH pair emitters must survive degenerate corpora (boilerplate-
heavy data where one bucket holds everything) with bounded task
memory and bounded output — the failure mode the cap exists for is a
single task owning an O(m^2) explode.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_precisely_demo_spark.operators.curation import contamination_pairs
from flink_precisely_demo_spark.operators.dedup import (
    minhash_near_dup_pairs,
    minhash_oversized_buckets,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    simhash_oversized_buckets,
)


def _degenerate_corpus(spark, n=10_000):
    """n near-identical docs: identical text -> identical signatures
    -> every LSH band puts all n docs in one bucket."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate legal disclaimer text repeated "
              "verbatim across every scraped page of this site").alias("text"))


def test_minhash_hot_bucket_capped(spark):
    docs = _degenerate_corpus(spark)
    # without the cap this would be 4 buckets x C(10k,2) ~ 200M pairs
    # in single tasks; with it the hot buckets are excluded entirely
    assert minhash_near_dup_pairs(docs, max_bucket_size=64).count() == 0
    over = minhash_oversized_buckets(docs, max_bucket_size=64).collect()
    assert len(over) == 4  # one per band
    assert all(r.n_ids == 10_000 for r in over)


def test_simhash_hot_bucket_capped(spark):
    docs = _degenerate_corpus(spark)
    assert simhash_near_dup_pairs(docs, max_bucket_size=64).count() == 0
    over = simhash_oversized_buckets(docs, max_bucket_size=64).collect()
    assert len(over) == 4
    assert all(r.n_ids == 10_000 for r in over)


def test_cap_sized_bucket_streams_pairs(spark):
    """A bucket at exactly the cap must emit its full pair set through
    the two-level generator: correctness (all C(m,2) pairs, ordered
    a < b) plus plan shape — pair emission is two pipelined Generate
    nodes (posexplode member, explode its tail pairs), so the largest
    array any row materializes is O(m) member structs, never the
    O(m^2/2) combos array a one-shot flatten builds."""
    m = 200
    docs = _degenerate_corpus(spark, n=m)
    pairs = minhash_near_dup_pairs(docs, max_bucket_size=m)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") >= 2, plan
    got = pairs.collect()
    assert len(got) == m * (m - 1) // 2
    assert all(r.a < r.b for r in got)


def test_default_cap_bounds_worst_case_task():
    """The default hot-bucket cap stays at 1024: C(1024,2) ~ 524k
    pair structs is the worst single-bucket emission (the prior 4096
    default allowed an 8.4M-struct task). The oracle SQL mirrors the
    same constant, so a drive-by change breaks hash parity loudly."""
    import inspect

    from flink_precisely_demo_spark.operators.dedup import (
        near_dup_clusters,
        simhash_oversized_buckets,
    )
    for fn in (minhash_near_dup_pairs, minhash_oversized_buckets,
               simhash_near_dup_pairs, simhash_oversized_buckets,
               near_dup_clusters):
        assert (inspect.signature(fn).parameters["max_bucket_size"].default
                == 1024), fn.__name__
    from flink_precisely_demo_spark.plans import dedup_queries
    src = inspect.getsource(dedup_queries)
    assert "bn <= 1024" in src and "4096" not in src.replace("* 4096", "")


def test_cap_no_op_on_normal_corpus(spark):
    """On a healthy corpus the cap changes nothing: tiny cap vs huge
    cap give identical pairs as long as no bucket exceeds either."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    small = {(r.a, r.b) for r in
             minhash_near_dup_pairs(docs, max_bucket_size=50).collect()}
    huge = {(r.a, r.b) for r in
            minhash_near_dup_pairs(docs, max_bucket_size=10**9).collect()}
    assert small == huge


def _stop_shingle_corpus(spark):
    """50 docs sharing only a boilerplate prefix (a df=50 stop-
    shingle cluster) + one genuinely duplicated pair of rare docs."""
    rows = [(i, f"alpha beta gamma delta epsilon uq{i}a uq{i}b uq{i}c")
            for i in range(50)]
    rows += [(100, "zeta eta theta iota kappa lambda"),
             (101, "zeta eta theta iota kappa lambda")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_df_cap_drops_stop_shingle_pairs(spark):
    docs = _stop_shingle_corpus(spark)
    # uncapped: the 50 boilerplate docs all pair up through the shared
    # prefix shingles (jaccard 3/9 = 0.333) -> C(50,2) join blowup
    uncapped = ngram_jaccard_pairs(docs, threshold=0.3, max_df=10**9)
    assert uncapped.filter(F.col("a") < 50).count() == 50 * 49 // 2
    # capped: df=50 stop-shingles leave the index; only the true
    # duplicate pair (shingles with df=2) survives
    capped = ngram_jaccard_pairs(docs, threshold=0.3, max_df=10).collect()
    assert {(r.a, r.b) for r in capped} == {(100, 101)}
    assert capped[0].jaccard == 1.0


def test_contamination_df_cap(spark):
    corpus_rows = [(i, f"c1 c2 c3 c4 c5 u{i}a u{i}b u{i}c u{i}d u{i}e")
                   for i in range(50)]
    # doc 999 is a verbatim copy of the benchmark item (real leakage)
    corpus_rows.append((999, "c1 c2 c3 c4 c5 b1 b2 b3 b4 b5"))
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    # id 7777 avoids the corpus_id != benchmark_id self-filter
    bench = spark.createDataFrame(
        [(7777, "c1 c2 c3 c4 c5 b1 b2 b3 b4 b5")], "doc_id long, text string")
    # uncapped with min_overlap=1: every boilerplate doc "contaminates"
    uncapped = contamination_pairs(corpus, bench, min_overlap=1,
                                   max_df=10**9)
    assert uncapped.count() == 51
    # capped: the df=51 boilerplate 5-gram leaves the index; only the
    # verbatim copy remains flagged, through its rare shingles
    capped = contamination_pairs(corpus, bench, min_overlap=1,
                                 max_df=10).collect()
    assert {(r.corpus_id, r.benchmark_id) for r in capped} == {(999, 7777)}


def test_connected_components_chain_and_islands(spark):
    from flink_precisely_demo_spark.operators.dedup import (
        connected_components,
    )
    # a 5-node path (needs multiple propagation rounds) + a 2-node
    # island + untouched singletons (absent from edges entirely)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "a long, b long")
    got = {r.node: r.label
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_near_dup_clusters_transitive(spark):
    from flink_precisely_demo_spark.operators.dedup import near_dup_clusters
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, text), (2, text), (3, text),          # one dup cluster
            (50, "completely different words here nothing shared at all")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.cluster_id for r in near_dup_clusters(docs).collect()}
    # the dup cluster collapses to its min id; the singleton labels itself
    assert got == {1: 1, 2: 1, 3: 1, 50: 50}


def test_connected_components_nonconvergence_strict_raises(spark):
    """With fallback disabled, a graph whose diameter exceeds the
    round budget must FAIL, not return mid-propagation labels that
    look like an answer."""
    import pytest

    from flink_precisely_demo_spark.operators.dedup import (
        connected_components,
    )
    # 8-node path needs ~7 rounds; cap at 2
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "a long, b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=2, fallback=None)


def test_connected_components_falls_back_to_star(spark):
    """Default behavior past the propagation budget: switch to the
    diameter-independent large-star/small-star algorithm and return
    CORRECT labels (never mid-propagation ones)."""
    from flink_precisely_demo_spark.operators.dedup import (
        connected_components,
    )
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)] + [(100, 101)], "a long, b long")
    got = {r.node: r.label
           for r in connected_components(edges, max_iter=2).collect()}
    assert got == {**{i: 0 for i in range(9)}, 100: 100, 101: 100}


def test_connected_components_star_diameter_50_path(spark):
    """The doubling variant handles a diameter-50 path directly in
    O(log^2 n) rounds — the shape min-label propagation cannot."""
    from flink_precisely_demo_spark.operators.dedup import (
        connected_components_star,
    )
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(50)] + [(200, 201), (201, 202)],
        "a long, b long")
    got = {r.node: r.label
           for r in connected_components_star(edges).collect()}
    assert got == {**{i: 0 for i in range(51)},
                   200: 200, 201: 200, 202: 200}


def test_connected_components_string_ids(spark):
    """String node ids: min-label is lexicographic; convergence must
    be detected by label change, not a numeric SUM (which is NULL on
    strings and once declared convergence after a single round)."""
    from flink_precisely_demo_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )
    # 4-hop chain: needs >1 propagation round, so a first-round false
    # convergence returns wrong labels for d/e
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "a string, b string")
    want = {"a": "a", "b": "a", "c": "a", "d": "a", "e": "a",
            "x": "x", "y": "x"}
    got = {r.node: r.label
           for r in connected_components(edges).collect()}
    assert got == want
    got_star = {r.node: r.label
                for r in connected_components_star(edges).collect()}
    assert got_star == want


def test_near_dup_clusters_chain_corpus(spark):
    """A chain corpus a~b, b~c, ... where consecutive docs overlap but
    distant ones don't: the candidate graph is a long path. With the
    star fallback the pipeline succeeds and collapses the whole chain
    into one cluster (propagation alone would exhaust its budget)."""
    from flink_precisely_demo_spark.operators.dedup import near_dup_clusters
    # sliding-window corpus: doc i = words w_i .. w_{i+9}; consecutive
    # docs share 9 of 10 words (LSH-certain collision), distant docs
    # share nothing -> the candidate graph is (at least) a 40-node path
    rows = [(i, " ".join(f"w{i + k}" for k in range(10)))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # cc_max_iter=3 << path length guarantees propagation gives up and
    # the star fallback finishes the job (pre-fallback this raised)
    out = near_dup_clusters(docs, num_hashes=16, bands=8, shingle_n=2,
                            cc_max_iter=3)
    got = {r.doc_id: r.cluster_id for r in out.collect()}
    assert got == {i: 0 for i in range(40)}


def test_fan_out_no_extra_shuffle_on_wide_lineage(spark):
    """An already-wide non-file lineage (post-shuffle, inputFiles
    empty) must NOT pay an extra repartition: _fan_out falls back to
    the physical partition count instead of assuming narrow."""
    from flink_precisely_demo_spark.operators.dedup import _fan_out
    wide = spark.range(1000).repartition(64, "id")
    out = _fan_out(wide, "id")
    assert out is wide                       # no-op, no added shuffle
    narrow = spark.range(10).coalesce(1)
    assert _fan_out(narrow, "id").rdd.getNumPartitions() >= 8


def _bot_feed(spark, n_clicks=5_000, n_purchases=20):
    """One bot user: n_clicks clicks and n_purchases purchases packed
    into a single hour (uncapped, the interval join emits
    n_clicks x n_purchases pairs), plus one normal user with 2 clicks
    before their 1 purchase."""
    base = 1_700_000_000  # seconds
    clicks = spark.range(n_clicks).select(
        (F.col("id") + 1_000_000).alias("click_id"),
        F.lit(7).alias("__cu"),
        (F.col("id") % 3600 + base).cast("timestamp").alias("click_ts"))
    purchases = spark.range(n_purchases).select(
        (F.col("id") + 2_000_000).alias("purchase_id"),
        F.lit(7).alias("user_id"),
        F.lit(base + 3_599).cast("timestamp").alias("purchase_ts"),
        F.lit(100.0).alias("value"))
    normal_c = spark.createDataFrame(
        [(1, 8, base + 100), (2, 8, base + 200)],
        "click_id long, __cu long, epoch long"
    ).select("click_id", "__cu",
             F.col("epoch").cast("timestamp").alias("click_ts"))
    normal_p = spark.createDataFrame(
        [(3, 8, base + 300, 50.0)],
        "purchase_id long, user_id long, epoch long, value double"
    ).select("purchase_id", "user_id",
             F.col("epoch").cast("timestamp").alias("purchase_ts"),
             "value")
    return purchases.unionByName(normal_p), clicks.unionByName(normal_c)


def test_attribution_bot_user_bounded(spark):
    """The r9 advisory bound: a bot with 5k clicks x 20 purchases in
    one hour must NOT emit 100k attribution pairs — the per-(user,
    hour) candidate cap bounds the join fan and the per-purchase
    touch cap bounds the credit rows to _MAX_TOUCHES, while the
    normal user's attribution is untouched."""
    from flink_precisely_demo_spark.plans.olap_queries import (
        _MAX_TOUCHES,
        _TOUCH_CAND_CAP,
        attribution_oversized_purchases,
        multi_touch_attribution,
    )

    p, c = _bot_feed(spark)
    out = multi_touch_attribution(p, c).collect()
    bot = [r for r in out if r.user_id == 7]
    # every bot purchase carries exactly the cap, never more
    assert len(bot) == 20 * _MAX_TOUCHES
    assert all(r.n_touches == _MAX_TOUCHES for r in bot)
    assert all(abs(r.value_share - 100.0 / _MAX_TOUCHES) < 1e-9
               for r in bot)
    # the normal user's 2-touch linear split is unaffected
    normal = [r for r in out if r.user_id == 8]
    assert len(normal) == 2
    assert all(r.n_touches == 2 and abs(r.value_share - 25.0) < 1e-9
               for r in normal)

    over = attribution_oversized_purchases(p, c).collect()
    assert len(over) == 20
    assert all(r.user_id == 7 and r.kept == _MAX_TOUCHES for r in over)
    # candidates reaching the rank stage were themselves pre-capped:
    # a 1-hour window spans at most two hour buckets
    assert all(r.n_candidates <= 2 * _TOUCH_CAND_CAP for r in over)


def test_exact_substring_spans_arithmetic(spark):
    """Constructed docs with a KNOWN shared run: the span must locate
    both start positions and report the exact token length; a shared
    run shorter than min_len must not appear; within-doc repetition
    alone must not pair a doc with itself."""
    from flink_precisely_demo_spark.operators.dedup import (
        exact_substring_spans)

    shared = " ".join(f"s{i}" for i in range(30))      # 30-token run
    short = " ".join(f"t{i}" for i in range(20))       # 20 < min_len 24
    docs = spark.createDataFrame(
        [
            (1, "a0 a1 a2 " + shared + " a3 a4"),       # run at pos 4
            (2, shared + " b0 b1 b2 b3 b4 b5 b6 b7"),   # run at pos 1
            (3, "c0 c1 " + short + " c2 c3 c4 c5 c6 c7 c8 c9 c10 c11"),
            (4, short + " d0 d1 d2 d3 d4 d5 d6 d7 d8 d9 d10 d11 d12"),
            (5, ("e0 " * 40).strip()),                   # self-repeat only
        ],
        "doc_id long, text string")
    got = {(int(r["a"]), int(r["b"]), int(r["a_start"]),
            int(r["b_start"]), int(r["run_tokens"]))
           for r in exact_substring_spans(docs, k=16, min_len=24)
           .collect()}
    assert got == {(1, 2, 4, 1, 30)}


def test_exact_substring_df_cap_bounds_emission(spark):
    """An anchor k-gram shared by more docs than max_df must emit NO
    alignments (the boilerplate bound); raising the cap restores the
    spans."""
    from flink_precisely_demo_spark.operators.dedup import (
        exact_substring_spans)

    boiler = " ".join(f"x{i}" for i in range(25))
    docs = spark.createDataFrame(
        [(i, boiler + f" u{i}a u{i}b") for i in range(6)],
        "doc_id long, text string")
    assert exact_substring_spans(docs, k=16, min_len=24,
                                 max_df=3).isEmpty()
    wide = exact_substring_spans(docs, k=16, min_len=24, max_df=64)
    assert wide.count() == 15                       # C(6,2) pairs
    assert {int(r["run_tokens"]) for r in wide.collect()} == {25}


def test_substring_contamination_sides_and_spans(spark):
    """Alignments must be strictly cross-split (train x bench, never
    within one side) and the span arithmetic must locate the shared
    run on both sides."""
    from flink_precisely_demo_spark.operators.dedup import (
        substring_contamination)

    shared = " ".join(f"s{i}" for i in range(30))
    train = spark.createDataFrame(
        [(1, "a0 a1 " + shared),        # leaks bench span, pos 3
         (2, "b0 " + shared),           # leaks bench span, pos 2
         (3, "clean " + " ".join(f"c{i}" for i in range(30)))],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(10, shared + " q0 q1"),
         (11, " ".join(f"z{i}" for i in range(30)))],
        "doc_id long, text string")
    got = {(int(r["train_id"]), int(r["bench_id"]), int(r["train_start"]),
            int(r["bench_start"]), int(r["run_tokens"]))
           for r in substring_contamination(train, bench,
                                            k=16, min_len=24).collect()}
    # train docs 1 and 2 both share the 30-token run with bench 10;
    # train 1/2 sharing it with EACH OTHER must NOT pair (same side)
    assert got == {(1, 10, 3, 1, 30), (2, 10, 2, 1, 30)}


def test_exact_substring_occ_cap_bounds_emission(spark):
    """An anchor k-gram UNDER the df cap but repeated many times
    WITHIN each document (boilerplate-heavy corpora) must be dropped
    by the total-occurrence cap — the case where df alone would let
    one hash emit positions_a x positions_b alignment rows; raising
    max_occ restores the spans."""
    from flink_precisely_demo_spark.operators.dedup import (
        exact_substring_spans)

    block = " ".join(f"p{i}" for i in range(16))    # one 16-token gram
    # 4 copies per doc, unique separators so ONLY the block windows
    # repeat: block appears at token positions 1, 18, 35, 52
    def doc(d):
        seps = [f"g{d}x{j}" for j in range(3)]
        return (block + " " + seps[0] + " " + block + " " + seps[1]
                + " " + block + " " + seps[2] + " " + block)
    docs = spark.createDataFrame(
        [(1, doc(1)), (2, doc(2))], "doc_id long, text string")
    # dfd = 2 (under max_df) but tot = 8 occurrences of the anchor
    assert exact_substring_spans(docs, k=16, min_len=16,
                                 max_occ=6).isEmpty()
    wide = exact_substring_spans(docs, k=16, min_len=16, max_occ=8)
    # every cross-doc position pair aligns: 4 x 4 = 16 runs of 16
    assert wide.count() == 16
    assert {int(r["run_tokens"]) for r in wide.collect()} == {16}


def test_substring_contamination_tags_sides_for_df_cap(spark):
    """Independent train/bench datasets with COLLIDING raw ids (both
    numbered from 0 — the generic API case): the df cap must count
    each side's documents as distinct, so a boilerplate gram in 3
    train docs + 3 bench docs with the same ids is df=6 (over a cap
    of 4), not a conflated df=3 (under it). A genuine leak between
    non-colliding content must still surface."""
    from flink_precisely_demo_spark.operators.dedup import (
        substring_contamination)

    boiler = " ".join(f"x{i}" for i in range(25))
    leak = " ".join(f"s{i}" for i in range(30))
    train = spark.createDataFrame(
        [(0, boiler + " ta0 ta1"), (1, boiler + " tb0 tb1"),
         (2, boiler + " tc0 tc1"), (5, "lead " + leak)],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(0, boiler + " qa0 qa1"), (1, boiler + " qb0 qb1"),
         (2, boiler + " qc0 qc1"), (7, leak + " tail0 tail1")],
        "doc_id long, text string")
    got = {(int(r["train_id"]), int(r["bench_id"]),
            int(r["train_start"]), int(r["bench_start"]),
            int(r["run_tokens"]))
           for r in substring_contamination(train, bench, k=16,
                                            min_len=24, max_df=4)
           .collect()}
    # boiler pairs (9 of them) suppressed by the side-tagged df cap;
    # the genuine 30-token leak still located on both sides
    assert got == {(5, 7, 2, 1, 30)}
