"""Oracle-verify (sf0.01, driver-style comparison) then time
(min-of-2 noop at $PLAN_SF_DIR, default sf0.1, tuned session like
bench.py) the named queries.

Usage:
    python scripts/check_and_time.py name1 name2 ...
    SKIP_ORACLE=1 python scripts/check_and_time.py ...   # time only
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

SF = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.1")
ORACLE_SF = "/root/testdata/sf0.01"


def main() -> None:
    names = sys.argv[1:]

    from flink_precisely_demo_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("check_and_time")
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()

    if not os.environ.get("SKIP_ORACLE"):
        from oracle_check import duckdb_con, compare
        con = duckdb_con(ORACLE_SF)
        ok = True
        for name in names:
            probs = compare(qs[name](spark, ORACLE_SF), con, osql[name])
            status = "PASS" if not probs else "FAIL " + "; ".join(probs)
            print(f"oracle {name}: {status}", flush=True)
            ok = ok and not probs
        if not ok:
            print("ORACLE FAILURES — not timing", flush=True)
            spark.stop()
            sys.exit(1)

    # warm like bench
    for w in names[:2]:
        try:
            qs[w](spark, "/root/testdata/sf0.001") \
                .write.mode("overwrite").format("noop").save()
        except Exception as exc:
            print(f"# warm {w}: {exc}", file=sys.stderr)

    from bench import cpu_steal_sample, steal_window_pct

    for name in names:
        runs = []
        s0 = cpu_steal_sample()
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, SF).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        if max(runs) > 2 * min(runs):
            t0 = time.perf_counter()
            qs[name](spark, SF).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        steal = steal_window_pct(s0, cpu_steal_sample())
        print(f"time {name}: {min(runs):.3f}s  (runs: "
              + ", ".join(f"{r:.3f}" for r in runs)
              + (f"; steal {steal:.1f}%" if steal is not None else "")
              + ")", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
