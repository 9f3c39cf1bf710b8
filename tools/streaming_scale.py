"""Streaming decade-scaling measurement (VERDICT r11 item 8).

The three Structured Streaming registry queries are fixed-cost-dominated
at sf0.1 (micro-batch setup + state-store init swamp the per-row work),
so their walls say nothing about state growth. This tool runs the same
three pipelines against the events table at sf0.01 / sf0.1 / the 10x
synth (`.scratch_sf1.0`, built by make_synth_sf1.py: 10 user-shifted
copies — 10x users at the same per-user activity) and reports, per
query and scale:

- wall seconds and number of data micro-batches,
- state-store rows (max numRowsTotal over operators/batches) — the
  claim under test: tumbling state ∝ open windows x event types,
  session state one row per (user, open session), dedup state one row
  per in-horizon distinct key — NEVER corpus-sized,
- state-store memory bytes (max memoryUsedBytes),
- emitted rows.

Usage: python tools/streaming_scale.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from probability_of_buying_two_products_together_hadoop_project_spark.session import get_spark  # noqa: E402
from probability_of_buying_two_products_together_hadoop_project_spark.streaming import streams  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1.0-synth", os.path.join(REPO, ".scratch_sf1.0")),
]


def pipeline(spark, sf_dir: str, which: str):
    ev = streams.read_events_stream(spark, f"{sf_dir}/events.parquet")
    if which == "tumbling":
        return (
            ev.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value")),
            "complete",
        )
    if which == "session":
        return (
            streams.session_counts(ev, gap="30 minutes", watermark="2 hours"),
            "append",
        )
    return (
        streams.dedup_stream(ev, key_cols=("user_id", "event_type")),
        "append",
    )


def measure(spark, sf_dir: str, which: str) -> dict:
    df, mode = pipeline(spark, sf_dir, which)
    name = f"_scale_{which}_{abs(hash((sf_dir, which))) % 10**9}"
    t0 = time.perf_counter()
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    state_rows = 0
    state_mem = 0
    data_batches = 0
    for p in q.recentProgress:
        if (p.get("numInputRows") or 0) > 0:
            data_batches += 1
        for so in p.get("stateOperators") or []:
            state_rows = max(state_rows, so.get("numRowsTotal") or 0)
            state_mem = max(state_mem, so.get("memoryUsedBytes") or 0)
    out_rows = spark.table(name).count()
    spark.catalog.dropTempView(name)
    q.stop()
    return {
        "wall_sec": round(wall, 2),
        "data_batches": data_batches,
        "out_rows": out_rows,
        "state_rows_max": state_rows,
        "state_mem_bytes_max": state_mem,
    }


def main() -> None:
    spark = get_spark("streaming-scale")
    results: dict[str, dict[str, dict]] = {}
    for which in ("tumbling", "session", "dedup"):
        results[which] = {}
        for label, sf_dir in SCALES:
            if not os.path.isdir(sf_dir):
                print(f"# skip {label}: {sf_dir} missing", file=sys.stderr)
                continue
            r = measure(spark, sf_dir, which)
            results[which][label] = r
            print(f"# {which} @ {label}: {r}", file=sys.stderr)
    out = sys.argv[1] if len(sys.argv) > 1 else None
    line = json.dumps(results, separators=(",", ":"))
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
