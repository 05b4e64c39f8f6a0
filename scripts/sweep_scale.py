"""Size-aware oracle sweep at a materialized scale point (sf1/sf10).

The pytest sweep (tests/test_oracle_parity.py with SF_DIR=...) fully
materializes BOTH engines' results per pair; at sf10 several queries
return 10M+ rows and the pandas compare dominates wall-clock without
adding evidence (their kernels are already swept green at sf1). This
driver hash-compares every pair whose output is small enough to
materialize honestly; for the row-explosion pairs it runs a
VALUE-LEVEL digest compare (oracle_check.digest_compare: both engines
reduce their full output to exact order-independent per-column
digests — counts, decimal sums, min/max, byte totals — that must
match exactly) plus a row-count check, replacing the old count-only
evidence. Queries whose DuckDB twin is cost-infeasible at this SF but
that derive ONLY from the documents table run both engines against a
derived sf_dir whose documents table is deterministically sliced
(doc_id % 20 = 0): the same predicate reaches both engines by
construction, so the FULL hash compare applies, just on bounded
input. The artifact says exactly which pairs got which check.

RESUMABLE (r11 verdict item 1: two 2h-budget overruns voided a full
sf10 pass each time): every completed entry is checkpointed to a
JSONL progress file AS IT FINISHES; a rerun with --resume carries
those results over and only runs what is missing (failed/errored
entries always re-run — resume must not fossilize a red row). A
budget overrun now costs the tail, not the whole pass.

Usage: python scripts/sweep_scale.py [sf_dir] [max_rows]
                                     [--progress PATH] [--resume]
Prints one JSON line; full per-pair detail to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def _bucket(status: str) -> str:
    """Map a per-entry status string to its artifact bucket."""
    if status.startswith("full-bounded-docs"):
        return "bounded"
    if status.startswith("full("):
        return "full"
    if status.startswith("digest("):
        return "digest"
    if status == "no-oracle":
        return "rows_only"
    if status.startswith("skipped-oracle-cost"):
        return "skipped"
    return "failed"


def _load_progress(path: str | None, resume: bool) -> dict[str, dict]:
    """Completed entries from a prior run. Failed/errored rows are
    dropped so they re-run: resume continues a pass, it never
    launders a red row into the merged artifact."""
    carried: dict[str, dict] = {}
    if not (resume and path and os.path.exists(path)):
        return carried
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            if _bucket(row["status"]) != "failed":
                carried[row["name"]] = {
                    "status": row["status"], "sec": row["sec"]}
    return carried


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/tmp/sf10")
    ap.add_argument("max_rows", nargs="?", type=int, default=3_000_000)
    ap.add_argument("--progress", default=None,
                    help="per-entry checkpoint JSONL (appended as "
                         "entries finish)")
    ap.add_argument("--resume", action="store_true",
                    help="carry over non-failed entries already in "
                         "--progress instead of re-running them")
    args = ap.parse_args()
    sf_dir, max_rows = args.sf_dir, args.max_rows

    carried = _load_progress(args.progress, args.resume)
    if carried:
        print(f"# resume: carrying {len(carried)} completed entries "
              f"from {args.progress}", file=sys.stderr, flush=True)

    import __spark_entry__ as m
    from oracle_check import compare, digest_compare, duckdb_con

    from flink_precisely_demo_spark.session import get_spark

    spark = get_spark("sweep_scale", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    con = duckdb_con(sf_dir)
    qs, oracles = m.queries(), m.oracle_sql()

    # single-table queries whose twin (or BOTH sides) is cost-
    # pathological at sf10 — the band-store unroll and the 5-gram
    # self-join on documents, and the label-blocked cosine self-join
    # on embeddings (10 labels x 20k vectors = ~2.4B candidate pairs
    # PER ENGINE at sf10): both engines run against the same
    # deterministically sliced dir instead, so the FULL hash compare
    # applies on bounded input rather than a count on unbounded
    doc_bounded = {"streaming_dedup_replay", "curation_contamination",
                   "dedup_embedding_cosine", "dedup_semantic"}
    bounded_dir = _make_doc_slice(spark, sf_dir)
    bounded_con = duckdb_con(bounded_dir)

    skip = {s for s in os.environ.get("SWEEP_SKIP", "").split(",") if s}
    only = {s for s in os.environ.get("SWEEP_ONLY", "").split(",") if s}
    buckets: dict[str, list[str]] = {
        "full": [], "digest": [], "bounded": [], "rows_only": [],
        "skipped": [], "failed": []}
    detail: dict[str, dict] = {}
    t_start = time.time()

    def record(name: str, status: str, sec: float,
               from_cache: bool = False) -> None:
        buckets[_bucket(status)].append(name)
        detail[name] = {"status": status, "sec": sec}
        tag = " (resumed)" if from_cache else ""
        print(f"# {name}: {status} [{sec:.1f}s]{tag}",
              file=sys.stderr, flush=True)
        if args.progress and not from_cache:
            with open(args.progress, "a") as f:
                f.write(json.dumps(
                    {"name": name, "status": status, "sec": sec}) + "\n")
                f.flush()

    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in carried:
            row = carried[name]
            record(name, row["status"], row["sec"], from_cache=True)
            continue
        t0 = time.time()
        if name in skip:
            # oracle-side cost is pathological at this SF even on the
            # bounded slice; recorded explicitly, validated at the
            # previous scale point
            record(name, "skipped-oracle-cost", 0)
            continue
        try:
            sql = oracles.get(name)
            q_dir, q_con = ((bounded_dir, bounded_con)
                            if name in doc_bounded else (sf_dir, con))
            df = fn(spark, q_dir)
            n_spark = df.count()
            if sql is None:
                status = "no-oracle"
            elif n_spark > max_rows:
                # the digest row carries row_cnt, so one aggregate
                # pass per engine covers count AND values — no
                # separate COUNT round trip over a billion-pair join
                problems = digest_compare(df, q_con, sql)
                if problems:
                    status = f"DIGEST-FAIL {problems[:3]}"
                else:
                    status = f"digest({n_spark})"
            else:
                problems = compare(df, q_con, sql)
                if problems:
                    status = f"FAIL {problems[:2]}"
                elif name in doc_bounded:
                    status = f"full-bounded-docs({n_spark})"
                else:
                    status = f"full({n_spark})"
        except Exception as exc:  # noqa: BLE001
            status = f"ERROR {type(exc).__name__}: {exc}"[:300]
        record(name, status, round(time.time() - t0, 1))

    print(json.dumps({
        "sf_dir": sf_dir,
        "max_rows_for_full_compare": max_rows,
        "n_full_hash_match": len(buckets["full"]),
        "n_digest_match": len(buckets["digest"]),
        "n_full_bounded_docs": len(buckets["bounded"]),
        "n_rows_only": len(buckets["rows_only"]),
        "n_failed": len(buckets["failed"]),
        "n_skipped_oracle_cost": len(buckets["skipped"]),
        "n_resumed": len(carried),
        "failed": buckets["failed"],
        "digest_match": buckets["digest"],
        "full_bounded_docs": buckets["bounded"],
        "rows_only": buckets["rows_only"],
        "skipped_oracle_cost": buckets["skipped"],
        "wall_sec": round(time.time() - t_start, 1),
        "detail": detail,
    }))
    spark.stop()


def _make_doc_slice(spark, sf_dir: str) -> str:
    """Derived sf_dir with documents AND embeddings sliced to a
    CONTIGUOUS 1/20 id range and every other table symlinked — the
    bounded input both engines see for the cost-pathological
    single-table pairs. A range slice (not modular) preserves the
    local pair structure near-dup/contamination queries measure: a
    doc's neighbors in its replica stay in the slice, so the bounded
    results stay non-trivial (the modular slice returned 0
    contamination pairs — agreed by both engines, but empty)."""
    sliced = {"documents": "doc_id", "embeddings": "vec_id"}
    out = f"{sf_dir.rstrip('/')}_docslice"
    marker = os.path.join(out, "_SLICE_OK_V3")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        from oracle_check import TABLES
        for t in TABLES:
            src = os.path.join(sf_dir, f"{t}.parquet")
            dst = os.path.join(out, f"{t}.parquet")
            if t in sliced:
                df = spark.read.parquet(src)
                limit = max(df.count() // 20, 1000)
                (df.filter(f"{sliced[t]} < {limit}")
                 .coalesce(4).write.mode("overwrite").parquet(dst))
            elif not os.path.exists(dst):
                os.symlink(os.path.abspath(src), dst)
        with open(marker, "w") as f:
            f.write("ok\n")
    return out


if __name__ == "__main__":
    main()
