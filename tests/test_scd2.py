"""SCD2 history reconstruction: no-op collapse, null-safe change
detection, out-of-order input, duplicate-timestamp tie-break, and the
one-exchange plan contract."""

import datetime as dt

from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational
from probability_of_buying_two_products_together_hadoop_project_spark.plans import explain


def _ts(h):
    return dt.datetime(2024, 1, 1, h)


def test_scd2_semantics(spark):
    rows = [
        # key 1: A -> A (no-op) -> B -> B (no-op) -> A ; delivered out of order
        (1, _ts(3), "B", 30),
        (1, _ts(1), "A", 10),
        (1, _ts(2), "A", 20),
        (1, _ts(4), "B", 40),
        (1, _ts(5), "A", 50),
        # key 2: null -> null (no-op, null-safe) -> X
        (2, _ts(1), None, 60),
        (2, _ts(2), None, 70),
        (2, _ts(3), "X", 80),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    out = relational.scd2_history(
        df, "user_id", "ts", ["event_type"], tiebreak="event_id"
    )
    got = [
        (r["user_id"], r["event_type"], r["valid_from"].hour,
         r["valid_to"].hour if r["valid_to"] else None,
         r["version"], r["is_current"])
        for r in out.orderBy("user_id", "version").collect()
    ]
    assert got == [
        (1, "A", 1, 3, 1, False),
        (1, "B", 3, 5, 2, False),
        (1, "A", 5, None, 3, True),
        (2, None, 1, 3, 1, False),
        (2, "X", 3, None, 2, True),
    ]


def test_scd2_duplicate_ts_tiebreak(spark):
    """Two changes at the same timestamp: event_id orders them, so the
    higher event_id's value wins as the later version (zero-length
    validity for the first) — deterministic across engines."""
    rows = [(1, _ts(1), "A", 1), (1, _ts(1), "B", 2)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    out = relational.scd2_history(
        df, "user_id", "ts", ["event_type"], tiebreak="event_id"
    )
    got = [
        (r["event_type"], r["version"], r["is_current"])
        for r in out.orderBy("version").collect()
    ]
    assert got == [("A", 1, False), ("B", 2, True)]


def test_scd2_multi_tracked_columns(spark):
    """A change in ANY tracked column opens a new version."""
    rows = [
        (1, _ts(1), "A", "x", 1),
        (1, _ts(2), "A", "y", 2),   # second column changes
        (1, _ts(3), "A", "y", 3),   # full no-op
    ]
    df = spark.createDataFrame(
        rows, "k long, ts timestamp, a string, b string, event_id long"
    )
    out = relational.scd2_history(df, "k", "ts", ["a", "b"], tiebreak="event_id")
    assert [
        (r["a"], r["b"], r["version"]) for r in out.orderBy("version").collect()
    ] == [("A", "x", 1), ("A", "y", 2)]


def test_scd2_single_exchange_plan(spark):
    """The change-detect window and the effective-dating windows share
    one (partition, order): exactly ONE shuffle exchange."""
    df = spark.createDataFrame(
        [(1, _ts(1), "A", 1)],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    out = relational.scd2_history(
        df, "user_id", "ts", ["event_type"], tiebreak="event_id"
    )
    assert explain.count_exchanges(out) == 1


def test_scd2_matches_python_reference_randomized(spark):
    """Randomized CDC logs (heavy ts ties, nulls, no-op runs, many keys)
    against an independent pure-python SCD2 reference."""
    import random

    rng = random.Random(20240814)
    rows = []
    eid = 0
    for key in range(12):
        for _ in range(rng.randrange(0, 25)):
            eid += 1
            rows.append(
                (
                    key,
                    _ts(1 + rng.randrange(0, 8)),   # only 8 hours -> many ties
                    rng.choice(["A", "B", "C", None]),
                    eid,
                )
            )
    if not rows:
        rows = [(0, _ts(1), "A", 1)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    got = [
        (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"],
         r["version"], r["is_current"])
        for r in relational.scd2_history(
            df, "user_id", "ts", ["event_type"], tiebreak="event_id"
        ).orderBy("user_id", "version").collect()
    ]

    want = []
    by_key = {}
    for k, ts, v, e in rows:
        by_key.setdefault(k, []).append((ts, e, v))
    for k in sorted(by_key):
        ordered = sorted(by_key[k], key=lambda t: (t[0], t[1]))
        surv = []
        prev = object()
        for ts, e, v in ordered:
            if v != prev:
                surv.append((ts, v))
            prev = v
        for i, (ts, v) in enumerate(surv):
            nxt = surv[i + 1][0] if i + 1 < len(surv) else None
            want.append((k, v, ts, nxt, i + 1, nxt is None))
    assert got == want


def test_pit_join_attaches_state_valid_at_event_time(spark, sf_smoke):
    """Feature-store temporal correctness: every purchase's attached
    profile state must be the LAST non-purchase event strictly-or-equal
    before it (never a later state), NULL before any history exists."""
    from probability_of_buying_two_products_together_hadoop_project_spark import registry

    ev = registry._t(spark, sf_smoke, "events").collect()
    got = {
        r.event_id: (r.profile_state, r.version)
        for r in registry.REGISTRY["pit_join_purchase_state"].fn(
            spark, sf_smoke
        ).collect()
    }
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    n_checked = n_null = 0
    for user, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        state = None
        version = 0
        prev = None
        for r in rows:
            if r.event_type == "purchase":
                want = (state, version if state is not None else None)
                assert got[r.event_id] == want, (r.event_id, got[r.event_id], want)
                n_checked += 1
                n_null += state is None
            else:
                if r.event_type != prev:
                    version += 1
                    prev = r.event_type
                state = prev
    assert n_checked > 0
