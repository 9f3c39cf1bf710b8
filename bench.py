"""Benchmark harness (driver contract + local feedback loop).

Runs the headline queries from ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "total_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is forced with a cheap ``count()``-style action
(``df.write.format("noop")``) so we measure full plan execution without
driver-side collect overhead dominating. Usage:

    python bench.py [--only name ...] [--repeat 1]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the flagship plus one representative per operator family.
# (Running all ~35 registry queries per round would blur the signal; these
# cover scan/agg, multi-join, window, sessionize, dedup, LSH, ANN, text.)
HEADLINE = [
    "cooccurrence_pairs",
    "cooccurrence_topk",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "window_running_orders",
    "topk_orders_per_customer",
    "events_sessionize",
    "dedup_exact",
    "minhash_near_dup",
    "text_stats",
    "embedding_topk",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from probability_of_buying_two_products_together_hadoop_project_spark.session import get_spark

    m = re.search(r"sf([0-9.]+)", args.sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    # warm the JVM (codegen, ICU case tables, parquet reader) so the first
    # measured query isn't charged for one-time init
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = entry_mod.queries()
    names = args.only or [n for n in HEADLINE if n in qs]

    timings: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(max(args.repeat, 1)):
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {best:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
