"""As-of join tests: hand-built fixture covering before-first, exact-tie,
between-rows, and missing-key cases."""

import datetime as dt

from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),  # before any right row -> null
            (2, "u1", _ts("2024-01-02 00:00:00")),  # exact tie -> matches
            (3, "u1", _ts("2024-01-03 12:00:00")),  # between rows -> earlier one
            (4, "u1", _ts("2024-01-05 00:00:00")),  # after last -> latest
            (5, "u2", _ts("2024-01-04 00:00:00")),  # key with no right rows
        ],
        "event_id bigint, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-02 00:00:00"), 100),
            ("u1", _ts("2024-01-03 00:00:00"), 200),
            ("u1", _ts("2024-01-04 00:00:00"), 300),
        ],
        "user string, rts timestamp, val bigint",
    )
    out = relational.asof_join(
        left, right, on="user", left_ts="ts", right_ts="rts",
        right_cols={"val": "last_val"},
    )
    got = {r["event_id"]: r["last_val"] for r in out.collect()}
    assert got == {1: None, 2: 100, 3: 200, 4: 300, 5: None}
    assert out.count() == left.count()  # no row blow-up, left-join semantics


def test_asof_join_tie_break_and_atomic_row(spark):
    """Two right rows at the SAME as-of timestamp: the greatest
    tie_break value wins, and every output column comes from that one
    winning row (atomic struct selection — per-column carry could mix
    rows when the winner holds nulls)."""
    left = spark.createDataFrame(
        [(1, 100, 10)], "event_id long, user_id long, ts long"
    )
    right = spark.createDataFrame(
        [(100, 5, 7, 70.0), (100, 5, 9, None), (100, 3, 8, 80.0)],
        "user_id long, rts long, k long, price double",
    )
    out = relational.asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="rts",
        right_cols={"k": "last_k", "price": "last_price"},
        tie_break="last_k",
    ).collect()[0]
    # ties at rts=5: k=9 beats k=7; its null price must NOT fall back to
    # k=7's 70.0 or k=8's 80.0
    assert out["last_k"] == 9 and out["last_price"] is None


def test_asof_join_matches_python_reference_randomized(spark):
    """Randomized draws with FEW distinct timestamps per key (so exact
    as-of ties are common) against an independent pure-Python as-of:
    most-recent right row with rts <= ts, ties broken by GREATEST
    tie_break value — the operator's pinned contract. Deterministic LCG
    corpus; several trials."""
    seed = 0xA50F
    for trial in range(4):
        seed = (seed * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        vals = []
        s = seed
        for _ in range(2000):
            s = (s * 48271) % 0x7FFFFFFF
            vals.append(s)
        lrows = [
            (i, f"k{vals[i] % 7}", _ts(f"2024-01-{vals[i + 200] % 9 + 1:02d} 00:00:00"))
            for i in range(150)
        ]
        rrows = [
            (
                f"k{vals[400 + j] % 7}",
                _ts(f"2024-01-{vals[600 + j] % 9 + 1:02d} 00:00:00"),
                1000 + j,  # val
                vals[800 + j] % 100,  # tie-break
            )
            for j in range(60)
        ]
        left = spark.createDataFrame(
            lrows, "event_id bigint, k string, ts timestamp"
        )
        right = spark.createDataFrame(
            rrows, "k string, rts timestamp, val bigint, tb bigint"
        )
        out = relational.asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols={"val": "val", "tb": "tb"}, tie_break="tb",
        )
        got = {r["event_id"]: (r["val"], r["tb"]) for r in out.collect()}
        assert len(got) == len(lrows)
        for eid, k, ts in lrows:
            cand = [r for r in rrows if r[0] == k and r[1] <= ts]
            if not cand:
                assert got[eid] == (None, None), (trial, eid)
                continue
            best_ts = max(c[1] for c in cand)
            tied = [c for c in cand if c[1] == best_ts]
            want = max(tied, key=lambda c: c[3])
            assert got[eid] == (want[2], want[3]), (trial, eid)
