"""Size-aware oracle sweep at a materialized scale point (sf1/sf10).

The pytest sweep (tests/test_oracle_parity.py with SF_DIR=...) fully
materializes BOTH engines' results per pair; at sf10 several queries
return 10M+ rows and the pandas compare dominates wall-clock without
adding evidence (their kernels are already swept green at sf1). This
driver hash-compares every pair whose output is small enough to
materialize honestly, and for the row-explosion pairs records an
explicit row-count-only check (Spark count vs DuckDB count) instead
of silently skipping — the artifact says exactly which pairs got
which check.

Usage: python scripts/sweep_scale.py [sf_dir] [max_rows]
Prints one JSON line; full per-pair detail to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    max_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000

    import __spark_entry__ as m
    from oracle_check import compare, duckdb_con

    from flink_precisely_demo_spark.session import get_spark

    spark = get_spark("sweep_scale", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    con = duckdb_con(sf_dir)
    qs, oracles = m.queries(), m.oracle_sql()

    skip = {s for s in os.environ.get("SWEEP_SKIP", "").split(",") if s}
    only = {s for s in os.environ.get("SWEEP_ONLY", "").split(",") if s}
    full, rows_only, failed, skipped = [], [], [], []
    t_start = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        if name in skip:
            # oracle-side cost is pathological at this SF (e.g. the
            # recursive-CTE connected-components twin); recorded
            # explicitly, validated at the previous scale point
            skipped.append(name)
            print(f"# {name}: skipped-oracle-cost", file=sys.stderr,
                  flush=True)
            continue
        try:
            sql = oracles.get(name)
            df = fn(spark, sf_dir)
            n_spark = df.count()
            if sql is None:
                status = "no-oracle"
                rows_only.append(name)
            elif n_spark > max_rows:
                n_duck = con.execute(
                    f"SELECT COUNT(*) FROM ({sql})").fetchone()[0]
                if n_spark == n_duck:
                    status = f"rows-only({n_spark})"
                    rows_only.append(name)
                else:
                    status = f"ROWS-MISMATCH spark={n_spark} duck={n_duck}"
                    failed.append(name)
            else:
                problems = compare(df, con, sql)
                if problems:
                    status = f"FAIL {problems[:2]}"
                    failed.append(name)
                else:
                    status = f"full({n_spark})"
                    full.append(name)
        except Exception as exc:  # noqa: BLE001
            status = f"ERROR {type(exc).__name__}: {exc}"[:300]
            failed.append(name)
        print(f"# {name}: {status} [{time.time() - t0:.1f}s]",
              file=sys.stderr, flush=True)

    print(json.dumps({
        "sf_dir": sf_dir,
        "max_rows_for_full_compare": max_rows,
        "n_full_hash_match": len(full),
        "n_rows_only": len(rows_only),
        "n_failed": len(failed),
        "n_skipped_oracle_cost": len(skipped),
        "failed": failed,
        "rows_only": rows_only,
        "skipped_oracle_cost": skipped,
        "wall_sec": round(time.time() - t_start, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
