"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with the noop sink
(count() could let Catalyst prune work; noop executes the complete
plan and discards rows, which is what a sink would cost minus IO).
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    "flagship_cdc_window_sum",
    "q1_pricing_summary",
    "tumbling_window_events",
    "enrichment_latest_join",
    "top_k_per_group",
    "sessionization",
    "asof_join_prior_click",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_bruteforce_topk",
    "text_filter_pipeline",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from flink_precisely_demo_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("bench", cpus=cpus)
    qs = entry_mod.queries()

    # untimed warmup: JVM JIT + codegen + Python worker pool startup
    # (fixed per-process costs, not per-query engine work; a cluster
    # pays them once at executor launch, not per query)
    warm_dir = "/root/testdata/sf0.001"
    qs["flagship_cdc_window_sum"](spark, warm_dir).write.mode("overwrite").format("noop").save()
    qs["dedup_minhash_lsh"](spark, warm_dir).write.mode("overwrite").format("noop").save()

    # two timed runs per query, keep the min: the host shows heavy
    # run-to-run CPU contention (same plan measured 0.9s and 23.9s
    # back to back); min-of-2 is the standard noise-robust estimator
    # and also absorbs stray one-off costs (worker forks, JIT).
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
