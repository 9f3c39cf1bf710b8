"""Structured Streaming tests: file-source streams drained with
availableNow must match their batch twins (Spark's batch/stream parity)."""

import os

import pytest
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.streaming import streams


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Write a small deterministic events table as parquet (micros
    timestamps, so the stream reader needs no legacy conf)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    rows = []
    for i in range(200):
        rows.append(
            (
                i,
                # two users, events every 10 min; user 1 has a 2h gap
                (i // 2) * 600 + (7200 if (i % 2 == 1 and i > 100) else 0),
                i % 2,
                ["view", "click", "buy"][i % 3],
                float(i),
                '{"k": %d}' % i,
            )
        )
    df = spark.createDataFrame(
        rows, "event_id bigint, off bigint, user_id bigint, event_type string, value double, props string"
    ).select(
        "event_id",
        (F.timestamp_seconds(F.lit(1704067200) + F.col("off"))).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(2).write.mode("overwrite").parquet(out)
    return out


def test_tumbling_stream_matches_batch(spark, events_dir):
    stream = streams.read_events_stream(spark, events_dir)
    streams.run_to_memory(streams.tumbling_counts(stream), "t_tumble")
    got = {
        (r["bucket"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.table("t_tumble").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    want = {(r["w"]["start"], r["event_type"]): (r["n"], r["s"]) for r in batch}
    assert got == want


def test_sliding_stream_counts(spark, events_dir):
    stream = streams.read_events_stream(spark, events_dir)
    streams.run_to_memory(
        streams.sliding_counts(stream, window="1 hour", slide="30 minutes"), "t_slide"
    )
    rows = spark.table("t_slide").collect()
    assert rows
    # every event lands in exactly 2 sliding buckets -> total = 2x events
    assert sum(r["n"] for r in rows) == 2 * spark.read.parquet(events_dir).count()


def test_streaming_cooccurrence_matches_batch(spark, tmp_path):
    """The flagship query as a stream: drain a basket stream with
    availableNow; counts must equal the batch operator's."""
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import basket

    lines = [
        "Mary 34 56 29 12 34 56 92 29 34 12",
        "Kelly 92 29 12 34 79 29 56 12 34 18",
        "Bob 1 2 1 2 1",
        "Ann 7 8 9",
    ]
    src = str(tmp_path / "baskets")
    batch_df = spark.createDataFrame([(l,) for l in lines], ["value"])
    basket.baskets_from_text(batch_df).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("customer string, items array<string>").parquet(src)
    q = (
        streams.cooccurrence_stream(stream)
        .writeStream.format("memory")
        .queryName("t_cooc")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["item"], r["neighbor"]): r["pair_cnt"]
        for r in spark.table("t_cooc").collect()
    }
    want = {
        (r["item"], r["neighbor"]): r["pair_cnt"]
        for r in basket.cooccurrence_counts(
            spark.read.parquet(src)
        ).collect()
    }
    assert got == want and got


def test_stateful_transition_counts_match_batch(spark, events_dir):
    stream = streams.read_events_stream(spark, events_dir)
    streams.run_append_to_memory(
        streams.transition_counts_stateful(stream), "t_trans"
    )
    got = {}
    for r in spark.table("t_trans").collect():
        k = (r["user_id"], r["prev_type"], r["curr_type"])
        got[k] = got.get(k, 0) + r["n"]
    # batch twin: lag window over (user, ts, event_id)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        spark.read.parquet(events_dir)
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("user_id", "prev_type", F.col("event_type").alias("curr_type"))
        .count()
        .collect()
    )
    want = {
        (r["user_id"], r["prev_type"], r["curr_type"]): r["count"] for r in batch
    }
    assert got == want


def test_stateful_state_carries_across_microbatches(spark, tmp_path):
    """Split events into two files consumed as separate micro-batches
    (maxFilesPerTrigger=1); the transition at the batch boundary is only
    counted if state (the last event type) carries across batches."""
    src = str(tmp_path / "two_batches")
    rows1 = [(0, "2024-01-01 10:00:00", 1, "view"), (1, "2024-01-01 10:01:00", 1, "click")]
    rows2 = [(2, "2024-01-01 10:02:00", 1, "buy"), (3, "2024-01-01 10:03:00", 1, "view")]

    def write_one(rows, name):
        (
            spark.createDataFrame(
                rows, "event_id bigint, ts_s string, user_id bigint, event_type string"
            )
            .select(
                "event_id",
                F.col("ts_s").cast("timestamp").alias("ts"),
                "user_id",
                "event_type",
                F.lit(0.0).alias("value"),
                F.lit("{}").alias("props"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/{name}")
        )

    write_one(rows1, "f0")
    write_one(rows2, "f1")
    stream = (
        spark.readStream.schema(streams.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    streams.run_append_to_memory(
        streams.transition_counts_stateful(stream), "t_carry"
    )
    got = {}
    for r in spark.table("t_carry").collect():
        k = (r["prev_type"], r["curr_type"])
        got[k] = got.get(k, 0) + r["n"]
    # click->buy spans the two micro-batches: only present if state carried
    assert got == {("view", "click"): 1, ("click", "buy"): 1, ("buy", "view"): 1}


def test_watermark_append_emits_only_closed_windows(spark, tmp_path):
    """Append-mode windowed aggregation with a 1h watermark across two
    micro-batches. Guaranteed semantics under test: every window whose end
    is at or below the final watermark is emitted exactly once with its
    aggregated count; windows still above the watermark are withheld.
    (Dropping of late rows is PERMITTED, not guaranteed — observed Spark
    4.1 behavior aggregates a straggler whose window is already below the
    watermark, so this test does not assert drops.)"""
    src = str(tmp_path / "late")

    def write_one(rows, name):
        (
            spark.createDataFrame(
                rows, "event_id bigint, ts_s string, user_id bigint, event_type string"
            )
            .select(
                "event_id",
                F.col("ts_s").cast("timestamp").alias("ts"),
                "user_id",
                "event_type",
                F.lit(1.0).alias("value"),
                F.lit("{}").alias("props"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/{name}")
        )

    # batch 1: two events in the 10:00 window -> watermark advances to 13:00-1h
    write_one(
        [(0, "2024-01-01 10:10:00", 1, "view"), (1, "2024-01-01 13:00:00", 1, "view")],
        "f0",
    )
    # batch 2: one on-time event (13:30) and one too-late event (09:20,
    # 2h40m behind the 12:00 watermark)
    write_one(
        [(2, "2024-01-01 13:30:00", 1, "view"), (3, "2024-01-01 09:20:00", 1, "view")],
        "f1",
    )
    stream = (
        spark.readStream.schema(streams.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = (
        streams.tumbling_counts(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("t_late").collect()
    got = {(r["bucket"].hour, r["event_type"]): r["n"] for r in rows}
    assert len(rows) == len(got)  # each closed window emitted exactly once
    # final watermark = 13:30 - 1h = 12:30: the 9:00 and 10:00 windows are
    # closed and emitted; the 13:00 window (end 14:00 > 12:30) is withheld
    assert got.get((10, "view")) == 1
    assert (13, "view") not in got


def test_session_window_stream(spark, events_dir):
    stream = streams.read_events_stream(spark, events_dir)
    streams.run_to_memory(
        streams.session_counts(stream, gap="30 minutes"), "t_sess"
    )
    rows = spark.table("t_sess").collect()
    assert rows
    # all events accounted for exactly once
    assert sum(r["n_events"] for r in rows) == spark.read.parquet(events_dir).count()
    # user 1's 2h gap splits its events into >= 2 sessions
    assert len([r for r in rows if r["user_id"] == 1]) >= 2


def test_dedup_stream_drops_watermark_window_duplicates(spark, tmp_path):
    """Streaming dedup keeps one row per key and matches the batch
    dropDuplicates result on the same input."""
    out = str(tmp_path / "dup_events")
    rows = []
    for i in range(50):
        rows.append((i % 20, 1704067200 + i * 60, i % 2, "view", float(i), "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id bigint, off bigint, user_id bigint, event_type string, value double, props string",
    ).select(
        "event_id",
        F.timestamp_seconds("off").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(out)

    stream = streams.read_events_stream(spark, out)
    streams.run_append_to_memory(streams.dedup_stream(stream), "t_dedup")
    got = spark.table("t_dedup").collect()
    assert len(got) == 20  # 50 rows, 20 distinct event_ids
    assert {r["event_id"] for r in got} == set(range(20))
    batch_n = spark.read.parquet(out).dropDuplicates(["event_id"]).count()
    assert len(got) == batch_n


def test_stream_stream_join_matches_batch(spark, events_dir):
    """Watermarked stream-stream interval join drained with availableNow
    must equal the identical batch join (view -> buy attribution)."""
    stream = streams.read_events_stream(spark, events_dir)
    streams.run_append_to_memory(
        streams.view_purchase_join(stream, right_type="buy"), "t_ss_join"
    )
    got = {tuple(r) for r in spark.table("t_ss_join").collect()}
    want = {
        tuple(r)
        for r in streams.view_purchase_join(
            spark.read.parquet(events_dir), right_type="buy"
        ).collect()
    }
    assert len(want) > 0
    assert got == want


def test_stream_stream_outer_join_matches_batch(spark, events_dir):
    """Left-outer watermarked stream-stream join: unconverted views emit
    null rows once the watermark passes their join window; with
    availableNow draining everything, the final result must equal the
    batch left join (including the null rows)."""
    stream = streams.read_events_stream(spark, events_dir)
    streams.run_append_to_memory(
        streams.view_purchase_join_outer(stream, right_type="buy"), "t_ss_outer"
    )
    got = {tuple(r) for r in spark.table("t_ss_outer").collect()}
    batch_rows = streams.view_purchase_join_outer(
        spark.read.parquet(events_dir), right_type="buy"
    ).collect()
    want = {tuple(r) for r in batch_rows}
    assert len(want) > 0
    assert any(r[3] is None for r in want)  # some views never convert
    # Streaming may emit FEWER null rows than batch: a view whose join
    # window extends past the final watermark (max_ts - delay) can never
    # prove "no purchase will arrive", so its null row is withheld.
    # Everything streaming emitted must be in the batch result, and the
    # only rows it may withhold are exactly those trailing null rows.
    assert got <= want
    import datetime as _dt

    max_ts = max(r["view_ts"] for r in batch_rows)
    horizon = max_ts - _dt.timedelta(hours=2) + _dt.timedelta(minutes=30)
    for row in want - got:
        assert row[3] is None  # withheld rows are always unmatched views
        assert row[2] + _dt.timedelta(minutes=30) > horizon
    # the matched (inner) portion must be complete
    assert {r for r in want if r[3] is not None} <= got


def test_upsert_sink_latest_version_wins(spark, tmp_path):
    """foreachBatch upsert sink: draining a stream of versioned rows must
    leave the parquet table holding exactly the newest row per key, and a
    second incremental run must merge (not duplicate)."""
    src = str(tmp_path / "updates")
    table = str(tmp_path / "state")

    def write_batch(rows, subdir):
        df = spark.createDataFrame(
            rows,
            "event_id bigint, off bigint, user_id bigint, event_type string, value double, props string",
        ).select(
            "event_id",
            F.timestamp_seconds("off").alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        df.coalesce(1).write.mode("append").parquet(src)

    write_batch([(k, 100 + k, k % 2, "v1", float(k), "{}") for k in range(5)], "a")
    q = streams.upsert_sink_parquet(
        streams.read_events_stream(spark, src), table,
        key_cols=("event_id",), order_col="ts", tiebreak_col="value",
    )
    q.awaitTermination()
    state1 = {r["event_id"]: r["event_type"] for r in spark.read.parquet(table).collect()}
    assert state1 == {k: "v1" for k in range(5)}

    # newer versions for keys 1,3 plus a brand-new key 9
    write_batch(
        [(1, 500, 1, "v2", 10.0, "{}"), (3, 500, 1, "v2", 10.0, "{}"),
         (9, 500, 1, "v2", 10.0, "{}")],
        "b",
    )
    q = streams.upsert_sink_parquet(
        streams.read_events_stream(spark, src), table,
        key_cols=("event_id",), order_col="ts", tiebreak_col="value",
    )
    q.awaitTermination()
    got = {r["event_id"]: r["event_type"] for r in spark.read.parquet(table).collect()}
    assert got == {0: "v1", 1: "v2", 2: "v1", 3: "v2", 4: "v1", 9: "v2"}


def test_upsert_sink_rewrites_only_touched_buckets(spark, tmp_path):
    """The bucket-partitioned sink must leave untouched buckets' files
    byte-identical (same paths, same mtimes) when a batch only hits one
    bucket — the O(touched state) per-batch cost contract."""
    import os

    src = str(tmp_path / "updates")
    table = str(tmp_path / "state")
    schema = (
        "event_id bigint, off bigint, user_id bigint, event_type string, "
        "value double, props string"
    )

    def push(rows):
        spark.createDataFrame(rows, schema).select(
            "event_id", F.timestamp_seconds("off").alias("ts"),
            "user_id", "event_type", "value", "props",
        ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        streams.upsert_sink_parquet(
            streams.read_events_stream(spark, src), table,
            key_cols=("event_id",), order_col="ts", tiebreak_col="value",
            n_buckets=4,
        ).awaitTermination()

    push([(k, 100 + k, k, "v1", float(k), "{}") for k in range(32)])
    drain()
    buckets = sorted(d for d in os.listdir(table) if d.startswith("bucket="))
    assert len(buckets) == 4  # 32 hashed keys land in all 4 buckets

    def snapshot():
        return {
            d: sorted(
                (f, os.stat(os.path.join(table, d, f)).st_mtime_ns)
                for f in os.listdir(os.path.join(table, d))
                if not f.startswith(".")
            )
            for d in buckets
        }

    before = snapshot()
    # one updated key -> exactly one touched bucket
    (hit,) = [
        r["b"]
        for r in spark.createDataFrame([(7,)], "event_id bigint")
        .select(F.pmod(F.xxhash64("event_id"), F.lit(4)).alias("b"))
        .collect()
    ]
    push([(7, 999, 7, "v2", 99.0, "{}")])
    drain()
    after = snapshot()
    for d in buckets:
        if d == f"bucket={hit}":
            assert before[d] != after[d]
        else:
            assert before[d] == after[d], f"untouched {d} was rewritten"
    got = {r["event_id"]: r["event_type"] for r in spark.read.parquet(table).collect()}
    assert got == {k: ("v2" if k == 7 else "v1") for k in range(32)}


def test_upsert_sink_recovers_from_crashed_swap(spark, tmp_path):
    """Simulate a crash between 'live -> .old' and 'tmp -> live': the
    bucket exists only as .old. The next batch must restore it before
    merging — no previously-merged keys may vanish (r03 advisory)."""
    import os

    src = str(tmp_path / "updates")
    table = str(tmp_path / "state")
    schema = (
        "event_id bigint, off bigint, user_id bigint, event_type string, "
        "value double, props string"
    )

    def push(rows):
        spark.createDataFrame(rows, schema).select(
            "event_id", F.timestamp_seconds("off").alias("ts"),
            "user_id", "event_type", "value", "props",
        ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        streams.upsert_sink_parquet(
            streams.read_events_stream(spark, src), table,
            key_cols=("event_id",), order_col="ts", tiebreak_col="value",
            n_buckets=2,
        ).awaitTermination()

    push([(k, 100 + k, k, "v1", float(k), "{}") for k in range(8)])
    drain()
    # crash simulation: one bucket's live dir renamed to .old, live gone
    victim = sorted(d for d in os.listdir(table) if d.startswith("bucket="))[0]
    b = int(victim.split("=")[1])
    os.replace(
        os.path.join(table, victim), os.path.join(table, f".old_bucket_{b}")
    )
    in_victim = {
        r["event_id"]
        for r in spark.createDataFrame(
            [(k,) for k in range(8)], "event_id bigint"
        )
        .filter(F.pmod(F.xxhash64("event_id"), F.lit(2)) == b)
        .collect()
    }
    assert in_victim  # the victim bucket holds some keys
    # the next batch deliberately does NOT touch the victim bucket: its
    # keys can only survive via the sweep-recovery of leftover .old dirs
    survivors = [k for k in range(8) if k not in in_victim]
    push([(k, 999, k, "v2", 99.0, "{}") for k in survivors])
    drain()
    got = {r["event_id"]: r["event_type"] for r in spark.read.parquet(table).collect()}
    assert got == {
        k: ("v1" if k in in_victim else "v2") for k in range(8)
    }
    assert not os.path.isdir(os.path.join(table, f".old_bucket_{b}"))


def test_upsert_sink_survives_injected_midswap_kill(spark, tmp_path):
    """END-TO-END kill-and-restart: a crash injected into a LIVE query
    between the atomic phases of the bucket swap (after 'live -> .old',
    and separately after 'tmp -> live' but before dropping .old) must
    never lose the bucket — at every instant the data exists under one
    of the two names — and the restarted query must replay the
    uncommitted batch and converge to exactly the post-batch state.
    The pre-existing crashed-swap test stages the on-disk layout by
    hand; this one kills the real code path mid-flight."""
    import os as _os

    import pytest

    src = str(tmp_path / "updates")
    table = str(tmp_path / "state")
    schema = (
        "event_id bigint, off bigint, user_id bigint, event_type string, "
        "value double, props string"
    )

    def push(rows):
        spark.createDataFrame(rows, schema).select(
            "event_id", F.timestamp_seconds("off").alias("ts"),
            "user_id", "event_type", "value", "props",
        ).coalesce(1).write.mode("append").parquet(src)

    def start():
        return streams.upsert_sink_parquet(
            streams.read_events_stream(spark, src), table,
            key_cols=("event_id",), order_col="ts", tiebreak_col="value",
            n_buckets=2,
        )

    push([(k, 100 + k, k, "v1", float(k), "{}") for k in range(8)])
    start().awaitTermination()

    real_replace = streams.os.replace
    for round_no, crash_after in enumerate((1, 2), start=2):
        # new versions for every key -> both buckets touched
        push([(k, 1000 * round_no, k, f"v{round_no}", 0.0, "{}") for k in range(8)])
        calls = {"n": 0}

        def bomb(a, b):
            real_replace(a, b)
            calls["n"] += 1
            if calls["n"] == crash_after:
                raise RuntimeError("injected mid-swap crash")

        streams.os.replace = bomb
        try:
            q = start()
            with pytest.raises(Exception, match="injected|Query"):
                q.awaitTermination()
        finally:
            streams.os.replace = real_replace
        # the mid-swap invariant: every bucket is present as live or .old
        for b in (0, 1):
            assert _os.path.isdir(_os.path.join(table, f"bucket={b}")) or (
                _os.path.isdir(_os.path.join(table, f".old_bucket_{b}"))
            ), f"bucket {b} lost after crash_after={crash_after}"
        # restart: recovery + idempotent replay of the uncommitted batch
        start().awaitTermination()
        got = {
            r["event_id"]: r["event_type"]
            for r in spark.read.parquet(table).collect()
        }
        assert got == {k: f"v{round_no}" for k in range(8)}, (
            f"crash_after={crash_after}"
        )
        # recovery left no staging debris behind
        assert not [
            d for d in _os.listdir(table)
            if d.startswith(".old_bucket_") or d.startswith(".tmp_")
        ]


def test_dedup_index_sink_unbounded_horizon(spark, tmp_path):
    """Streaming dedup against the persisted digest index: within-batch
    dups collapse to min id, cross-RUN dups are dropped no matter how
    old (no watermark horizon), and replaying all input against an
    existing index adds nothing (idempotent recovery)."""
    src = str(tmp_path / "docs")
    table = str(tmp_path / "survivors")

    def docs_stream():
        return (
            spark.readStream.schema("doc_id bigint, text string").parquet(src)
        )

    def write_docs(rows):
        spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
            1
        ).write.mode("append").parquet(src)

    write_docs([(1, "first text"), (2, "first  TEXT"), (3, "other")])
    streams.dedup_index_sink(docs_stream(), table).awaitTermination()
    got1 = {
        (r["doc_id"], r["n_in_batch"]) for r in spark.read.parquet(table).collect()
    }
    assert got1 == {(1, 2), (3, 1)}  # 2 is a normalized dup of 1

    # a later run delivers an old duplicate plus fresh content
    write_docs([(10, "FIRST text"), (11, "brand new")])
    streams.dedup_index_sink(docs_stream(), table).awaitTermination()
    got2 = {
        (r["doc_id"], r["n_in_batch"]) for r in spark.read.parquet(table).collect()
    }
    assert got2 == got1 | {(11, 1)}  # 10 dropped: index horizon is forever

    # full-replay idempotency: fresh checkpoint, same source -> every
    # batch recomputes an empty delta against the existing index
    import shutil as _sh

    _sh.rmtree(table + "._checkpoint")
    streams.dedup_index_sink(docs_stream(), table).awaitTermination()
    got3 = {
        (r["doc_id"], r["n_in_batch"]) for r in spark.read.parquet(table).collect()
    }
    assert got3 == got2


def test_kmv_sketch_sink_equals_batch_sketch(spark, tmp_path):
    """Drain events in two micro-batches through the KMV sketch sink:
    the persisted state must equal the one-shot batch sketch of ALL
    rows (k-minima merging is lossless), and so must the estimate."""
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import sketches

    src = str(tmp_path / "kmv_src")
    rows1 = [(i, f"2024-01-01 10:{i % 60:02d}:00", i % 37, "view") for i in range(120)]
    rows2 = [(1000 + i, f"2024-01-01 11:{i % 60:02d}:00", i % 53, "view") for i in range(120)]
    for name, rows in (("f0", rows1), ("f1", rows2)):
        (
            spark.createDataFrame(
                rows, "event_id bigint, ts_s string, user_id bigint, event_type string"
            )
            .select(
                "event_id",
                F.col("ts_s").cast("timestamp").alias("ts"),
                "user_id",
                "event_type",
                F.lit(0.0).alias("value"),
                F.lit("{}").alias("props"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/{name}")
        )
    stream = (
        spark.readStream.schema(streams.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    state = str(tmp_path / "kmv_state")
    q = streams.kmv_sketch_sink(stream, state, "user_id", ["event_type"], k=16)
    q.awaitTermination()

    full = spark.read.parquet(f"{src}/f*")
    want = sorted(
        tuple(r)
        for r in sketches.kmv_sample(full, "user_id", ["event_type"], k=16).collect()
    )
    got = sorted(tuple(r) for r in spark.read.parquet(state).collect())
    assert got == want
    est = sketches.kmv_estimate(
        spark.read.parquet(state), ["event_type"], k=16
    ).collect()[0]
    direct = sketches.kmv_distinct(full, "user_id", ["event_type"], k=16).collect()[0]
    assert tuple(est) == tuple(direct)


# ---------------------------------------------------------------------------
# agg_state_sink (streaming incremental view maintenance)
# ---------------------------------------------------------------------------


def _write_order_files(spark, src, batches):
    """batches: list of row-lists (o_custkey, o_totalprice, sign)."""
    for i, rows in enumerate(batches):
        (
            spark.createDataFrame(
                rows, "o_custkey bigint, o_totalprice double, sign int"
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/f{i}")
        )


def _orders_stream(spark, src):
    return (
        spark.readStream.schema(
            "o_custkey bigint, o_totalprice double, sign int"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )


def test_agg_state_sink_matches_direct_aggregate(spark, tmp_path):
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational

    src = str(tmp_path / "ivm_src")
    b0 = [(k % 7, float(k) + 0.25, 1) for k in range(60)]
    b1 = [(k % 5, float(k) * 2 + 0.5, 1) for k in range(40)]
    _write_order_files(spark, src, [b0, b1])
    state = str(tmp_path / "ivm_state")
    q = streams.agg_state_sink(
        _orders_stream(spark, src), state, ["o_custkey"], "o_totalprice"
    )
    q.awaitTermination()
    want = sorted(
        tuple(r)
        for r in relational.agg_state(
            spark.read.parquet(f"{src}/f*"), ["o_custkey"], "o_totalprice"
        ).collect()
    )
    got = sorted(tuple(r) for r in spark.read.parquet(state).collect())
    assert got == want


def test_agg_state_sink_cdc_deletes_drop_keys(spark, tmp_path):
    src = str(tmp_path / "cdc_src")
    # batch 0 inserts keys 1..3; batch 1 deletes ALL key-2 rows and one
    # key-3 row
    b0 = [(1, 10.0, 1), (2, 20.0, 1), (2, 5.0, 1), (3, 7.0, 1), (3, 8.0, 1)]
    b1 = [(2, 20.0, -1), (2, 5.0, -1), (3, 8.0, -1)]
    _write_order_files(spark, src, [b0, b1])
    state = str(tmp_path / "cdc_state")
    q = streams.agg_state_sink(
        _orders_stream(spark, src),
        state,
        ["o_custkey"],
        "o_totalprice",
        sign_col="sign",
    )
    q.awaitTermination()
    got = {
        r.o_custkey: (r.n_rows, float(r.sum_dec))
        for r in spark.read.parquet(state).collect()
    }
    assert got == {1: (1, 10.0), 3: (1, 7.0)}  # key 2 gone entirely


def test_agg_state_sink_checkpoint_loss_replay_is_noop(spark, tmp_path):
    """Losing the streaming checkpoint replays every batch from id 0;
    the _applied_batch marker must make each replay a no-op instead of
    double-counting (delta addition is not idempotent)."""
    import shutil

    src = str(tmp_path / "rp_src")
    b0 = [(1, 3.0, 1), (2, 4.0, 1)]
    b1 = [(1, 5.0, 1)]
    _write_order_files(spark, src, [b0, b1])
    state = str(tmp_path / "rp_state")
    q = streams.agg_state_sink(
        _orders_stream(spark, src), state, ["o_custkey"], "o_totalprice"
    )
    q.awaitTermination()
    first = sorted(tuple(r) for r in spark.read.parquet(state).collect())
    shutil.rmtree(state + "._checkpoint")  # lose the checkpoint entirely
    q2 = streams.agg_state_sink(
        _orders_stream(spark, src), state, ["o_custkey"], "o_totalprice"
    )
    q2.awaitTermination()
    again = sorted(tuple(r) for r in spark.read.parquet(state).collect())
    assert again == first


def test_agg_state_sink_recovers_from_crashed_swap(spark, tmp_path):
    """Crash between replace(state->old) and replace(staged->state):
    on restart the sink must restore .old and re-apply the batch."""
    src = str(tmp_path / "cr_src")
    b0 = [(1, 3.0, 1)]
    _write_order_files(spark, src, [b0])
    state = str(tmp_path / "cr_state")
    q = streams.agg_state_sink(
        _orders_stream(spark, src), state, ["o_custkey"], "o_totalprice"
    )
    q.awaitTermination()
    # simulate the mid-swap crash: live dir renamed to .old, no new dir
    os.replace(state, state + ".old")
    (
        spark.createDataFrame(
            [(1, 4.0, 1)], "o_custkey bigint, o_totalprice double, sign int"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{src}/f1")
    )
    q2 = streams.agg_state_sink(
        _orders_stream(spark, src), state, ["o_custkey"], "o_totalprice"
    )
    q2.awaitTermination()
    got = [
        (r.n_rows, float(r.sum_dec))
        for r in spark.read.parquet(state).collect()
    ]
    assert got == [(2, 7.0)]


def test_countmin_sink_equals_batch_sketch(spark, tmp_path):
    """Two micro-batches through the Count-Min sink: persisted cells
    must equal the one-shot sketch of all rows (cell-wise addition is
    the mergeability contract), and lookups must match."""
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import sketches

    src = str(tmp_path / "cms_src")
    words1 = [("spark",)] * 30 + [("join",)] * 10 + [("scan",)] * 3
    words2 = [("spark",)] * 15 + [("agg",)] * 7
    for name, rows in (("f0", words1), ("f1", words2)):
        (
            spark.createDataFrame(rows, "word string")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/{name}")
        )
    stream = (
        spark.readStream.schema("word string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    state = str(tmp_path / "cms_state")
    q = streams.countmin_sink(stream, state, "word", depth=4, width=64)
    q.awaitTermination()
    full = spark.read.parquet(f"{src}/f*")
    want = sorted(
        tuple(r)
        for r in sketches.countmin_cells(full, "word", depth=4, width=64).collect()
    )
    got = sorted(tuple(r) for r in spark.read.parquet(state).collect())
    assert got == want
    probes = spark.createDataFrame([("spark",), ("agg",), ("never",)], "word string")
    est = {
        r.word: r.est
        for r in sketches.countmin_lookup(
            spark.read.parquet(state), probes, "word", depth=4, width=64
        ).collect()
    }
    assert est["spark"] >= 45 and est["agg"] >= 7  # CMS never undercounts
    assert est["never"] <= est["scan"] if "scan" in est else True


# fingerprint_sink (streaming copy-validation maintenance)


def test_fingerprint_sink_equals_batch_fingerprint(spark, tmp_path):
    """Two micro-batches through the fingerprint sink: the persisted
    one-row state must equal the one-shot content_fingerprint of all
    rows ever delivered (digest addition is the mergeability
    contract), and a checkpoint-loss replay must be a no-op."""
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational

    src = str(tmp_path / "fp_src")
    rows1 = [(1, "a"), (2, "b"), (3, "c")]
    rows2 = [(4, "d"), (5, "e")]
    for name, rows in (("f0", rows1), ("f1", rows2)):
        (
            spark.createDataFrame(rows, "k bigint, v string")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/{name}")
        )
    stream = (
        spark.readStream.schema("k bigint, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    state = str(tmp_path / "fp_state")
    q = streams.fingerprint_sink(stream, state, ["k", "v"], "t")
    q.awaitTermination()
    want = relational.content_fingerprint(
        spark.read.parquet(f"{src}/f*"), ["k", "v"], "t"
    ).collect()[0]
    got = spark.read.parquet(state).collect()[0]
    assert (got.dataset, got.n_rows, got.content_hash) == (
        want.dataset, want.n_rows, want.content_hash,
    )
    # checkpoint loss: a fresh query over the same files replays both
    # batches; the marker-in-state guard must make them no-ops
    import shutil

    shutil.rmtree(state + "._checkpoint")
    q2 = streams.fingerprint_sink(stream, state, ["k", "v"], "t")
    q2.awaitTermination()
    again = spark.read.parquet(state).collect()[0]
    assert (again.n_rows, again.content_hash) == (got.n_rows, got.content_hash)


def test_fingerprint_sink_cdc_deletes_subtract(spark, tmp_path):
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational

    src = str(tmp_path / "fpc_src")
    b0 = [(1, "a", 1), (2, "b", 1), (3, "c", 1)]
    b1 = [(2, "b", -1), (9, "z", 1)]  # delete 2, insert 9
    for name, rows in (("f0", b0), ("f1", b1)):
        (
            spark.createDataFrame(rows, "k bigint, v string, sign int")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/{name}")
        )
    stream = (
        spark.readStream.schema("k bigint, v string, sign int")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    state = str(tmp_path / "fpc_state")
    q = streams.fingerprint_sink(stream, state, ["k", "v"], "t", sign_col="sign")
    q.awaitTermination()
    live = spark.createDataFrame(
        [(1, "a"), (3, "c"), (9, "z")], "k bigint, v string"
    )
    want = relational.content_fingerprint(live, ["k", "v"], "t").collect()[0]
    got = spark.read.parquet(state).collect()[0]
    assert (got.n_rows, got.content_hash) == (want.n_rows, want.content_hash)


# ---------------------------------------------------------------------------
# streaming CUSUM: agg_state_sink (hourly counts) + cusum_from_counts
# ---------------------------------------------------------------------------


def test_streaming_cusum_equals_batch_chart(spark, tmp_path):
    """The streaming CUSUM design: a (type, hour) agg-state sink keeps
    the calendar-bounded count table current per micro-batch; the chart
    recomputes exactly from that state (bucket-sized work). After all
    batches it must equal the batch operator bit-for-bit."""
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import timeseries

    src = str(tmp_path / "cusum_src")
    base = 3_600_000_000
    # two deliveries; the second raises the level (the changepoint)
    b0 = [("view", h * base + j) for h in range(6) for j in range(3)]
    b1 = [("view", h * base + j) for h in range(6, 10) for j in range(20)]
    for i, rows in enumerate([b0, b1]):
        (
            spark.createDataFrame(rows, "event_type string, t_us long")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/f{i}")
        )
    stream = (
        spark.readStream.schema("event_type string, t_us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
        .select(
            "event_type",
            F.date_trunc("hour", F.timestamp_micros("t_us")).alias("hr"),
            F.lit(1.0).alias("one"),
        )
    )
    state = str(tmp_path / "cusum_state")
    q = streams.agg_state_sink(stream, state, ["event_type", "hr"], "one")
    q.awaitTermination()
    hc = spark.read.parquet(state).select(
        "event_type", "hr", F.col("n_rows").alias("cnt")
    )
    got = sorted(
        tuple(r)
        for r in timeseries.cusum_from_counts(hc, ("event_type",)).collect()
    )
    full = spark.read.parquet(f"{src}/f*").select(
        "event_type",
        F.timestamp_micros("t_us").alias("ts"),
        F.lit(0).alias("event_id"),
    )
    want = sorted(
        tuple(r) for r in timeseries.cusum_detect(full, ("event_type",)).collect()
    )
    assert got == want
    # and the planted level shift actually alarms in the streamed chart
    alarms = [r for r in got if r[-1] == 1]
    assert alarms
    # the EWMA-referenced adaptive chart consumes the SAME maintained
    # state: streamed == batch bit-for-bit there too
    got_a = sorted(
        tuple(r)
        for r in timeseries.cusum_adaptive_from_counts(
            hc, ("event_type",)
        ).collect()
    )
    want_a = sorted(
        tuple(r)
        for r in timeseries.cusum_adaptive_detect(
            full, ("event_type",)
        ).collect()
    )
    assert got_a == want_a


def test_streaming_theilsen_equals_batch_trend(spark, tmp_path):
    """Streaming Theil-Sen rides the same composition as streaming
    CUSUM: the (type, hour) agg-state sink + theilsen_from_counts over
    the maintained state == the batch operator bit-for-bit (the pair
    quadratic is calendar-bounded, so per-batch recompute is cheap)."""
    from probability_of_buying_two_products_together_hadoop_project_spark.operators import timeseries

    src = str(tmp_path / "ts_src")
    base = 3_600_000_000
    b0 = [("view", h * base + j) for h in range(5) for j in range(3 + h)]
    b1 = [("view", h * base + j) for h in range(5, 9) for j in range(3 + 2 * h)]
    for i, rows in enumerate([b0, b1]):
        (
            spark.createDataFrame(rows, "event_type string, t_us long")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/f{i}")
        )
    stream = (
        spark.readStream.schema("event_type string, t_us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
        .select(
            "event_type",
            F.date_trunc("hour", F.timestamp_micros("t_us")).alias("hr"),
            F.lit(1.0).alias("one"),
        )
    )
    state = str(tmp_path / "ts_state")
    q = streams.agg_state_sink(stream, state, ["event_type", "hr"], "one")
    q.awaitTermination()
    hc = spark.read.parquet(state).select(
        "event_type", "hr", F.col("n_rows").alias("cnt")
    )
    got = sorted(
        tuple(r)
        for r in timeseries.theilsen_from_counts(hc, ("event_type",)).collect()
    )
    full = spark.read.parquet(f"{src}/f*").select(
        "event_type",
        F.timestamp_micros("t_us").alias("ts"),
        F.lit(0).alias("event_id"),
    )
    want = sorted(
        tuple(r)
        for r in timeseries.theilsen_trend(full, ("event_type",)).collect()
    )
    assert got == want and got[0][1] > 0  # pairs exist; trend positive
    assert got[0][2] > 0


def test_registry_streaming_queries_real_emission(spark, sf_smoke):
    """The two r11 registry streaming entries run REAL streaming
    (availableNow into a memory sink): complete mode equals the batch
    aggregate; append mode emits exactly the watermark-closed sessions
    (end < max ts - 2h) and withholds the tail."""
    import datetime

    import __spark_entry__ as e

    qs = e.queries()
    tum = qs["streaming_tumbling_complete_events"](spark, sf_smoke)
    batch_n = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
        .count()
    )
    assert tum.count() == batch_n

    sess = qs["streaming_session_append_watermark"](spark, sf_smoke)
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    allsess = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    mx = ev.agg(F.max("ts")).first()[0]
    wm = mx - datetime.timedelta(hours=2)
    closed = allsess.filter(F.col("w.end") < F.lit(wm))
    assert sess.count() == closed.count()
    assert sess.count() < allsess.count()  # the open tail is withheld
