"""Curation operators: the stability/correctness properties that make
them safe at 100 TB (oracle parity covers the value-level checks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_precisely_demo_spark.functions.text import token_count
from flink_precisely_demo_spark.operators.curation import (
    contamination_pairs,
    deterministic_sample,
    pack_token_chunks,
    train_val_test_split,
)
from flink_precisely_demo_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_sample_is_stable_and_sized(spark):
    docs = load_table(spark, SF, "documents")
    s1 = {r["doc_id"] for r in
          deterministic_sample(docs, "doc_id", 10).select("doc_id").collect()}
    s2 = {r["doc_id"] for r in
          deterministic_sample(docs, "doc_id", 10).select("doc_id").collect()}
    assert s1 == s2, "same sample every run"
    n = docs.count()
    assert 0.04 * n <= len(s1) <= 0.2 * n, f"~10% of {n}, got {len(s1)}"
    # a larger sample is a superset: rows only ever get ADDED
    s20 = {r["doc_id"] for r in
           deterministic_sample(docs, "doc_id", 20).select("doc_id").collect()}
    assert s1 <= s20


def test_split_is_growth_stable(spark):
    """Assignments computed on HALF the corpus agree with assignments
    on the full corpus — docs never migrate between splits as the
    dataset grows (the leakage-safety property)."""
    docs = load_table(spark, SF, "documents")
    full = {r["doc_id"]: r["split"] for r in
            train_val_test_split(docs, "doc_id").select("doc_id", "split").collect()}
    half = {r["doc_id"]: r["split"] for r in
            train_val_test_split(docs.filter(F.col("doc_id") < 250), "doc_id")
            .select("doc_id", "split").collect()}
    assert all(full[d] == s for d, s in half.items())
    assert set(full.values()) == {"train", "val", "test"}
    # splits partition the corpus
    assert len(full) == docs.count()


def test_contamination_finds_planted_overlap(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "alpha beta gamma delta epsilon zeta iota kappa"),
         (3, "completely different words nothing shared here at all")],
        "doc_id long, text string")
    bench = docs.filter(F.col("doc_id") == 1)
    pairs = contamination_pairs(docs, bench, shingle_n=5, min_overlap=2).collect()
    assert [(r["corpus_id"], r["benchmark_id"]) for r in pairs] == [(2, 1)]
    # doc 2 shares the 5-grams starting at alpha/beta: exactly 2
    assert pairs[0]["n_shared"] == 2


def test_pack_chunks_budget_and_order(spark):
    docs = load_table(spark, SF, "documents")
    packed = pack_token_chunks(docs, ["lang", "source"],
                               token_count("text").cast("long"),
                               budget=512)
    rows = packed.select("lang", "source", "doc_id", "n_tokens", "chunk_id") \
        .collect()
    by_group: dict = {}
    for r in sorted(rows, key=lambda r: (r["lang"], r["source"], r["doc_id"])):
        by_group.setdefault((r["lang"], r["source"]), []).append(r)
    for grp in by_group.values():
        run = 0
        prev_chunk = 0
        for r in grp:
            chunk = r["chunk_id"]
            assert chunk >= prev_chunk, "chunk ids non-decreasing in doc order"
            if chunk != prev_chunk:
                run = 0
                prev_chunk = chunk
            # every doc STARTS within the budget of its chunk
            assert run < 512
            run += r["n_tokens"]


def test_stratified_sample_exact_quota_and_determinism(spark):
    from flink_precisely_demo_spark.operators.curation import (
        stratified_sample,
    )
    rows = [(i, "en" if i % 3 else "de", f"s{i % 2}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    s = stratified_sample(df, ["lang", "source"], "doc_id", 10)
    got = {(r.lang, r.source): r.n for r in
           s.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n")).collect()}
    import math
    expected = {}
    for i in range(200):
        k = ("en" if i % 3 else "de", f"s{i % 2}")
        expected[k] = expected.get(k, 0) + 1
    assert got == {k: math.ceil(n * 0.10) for k, n in expected.items()}
    # selection (not just counts) is deterministic across runs
    ids1 = sorted(r.doc_id for r in s.collect())
    ids2 = sorted(r.doc_id for r in
                  stratified_sample(df, ["lang", "source"], "doc_id", 10).collect())
    assert ids1 == ids2


def test_mixture_sample_respects_targets_and_determinism(spark):
    """Sampled counts track the per-stratum targets (md5-bucket
    binomial, so within a generous tolerance), oversized strata are
    DOWN-sampled, undersized strata are kept whole (never
    upsampled), unknown strata are dropped, and the selection is
    run-to-run identical."""
    from flink_precisely_demo_spark.operators.curation import (
        mixture_sample,
    )

    rows = ([(i, "big") for i in range(800)]
            + [(i + 1000, "small") for i in range(40)]
            + [(i + 2000, "unknown") for i in range(50)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mixture_sample(df, "lang", {"big": 0.5, "small": 0.5},
                         budget_frac=0.5, grain=10000)
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "unknown" not in got
    # budget = 445, target each = 222; big downsamples toward 222
    assert 160 <= got["big"] <= 285, got
    # small (40 docs) is far under its 222 target: kept whole
    assert got["small"] == 40, got
    again = sorted(r["doc_id"] for r in out.collect())
    assert again == sorted(r["doc_id"] for r in
                           mixture_sample(df, "lang",
                                          {"big": 0.5, "small": 0.5},
                                          budget_frac=0.5,
                                          grain=10000).collect())


def test_snapshot_diff_partitions_key_universe(spark):
    """Every key lands in exactly one status; diff(x, x) is all
    unchanged; content edits (not key presence) drive 'changed'."""
    from flink_precisely_demo_spark.operators.curation import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, None), (5, "e")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["status"]
           for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "unchanged", 5: "added"}
    same = snapshot_diff(old, old).collect()
    assert all(r["status"] == "unchanged" for r in same)
    assert len(same) == 4
