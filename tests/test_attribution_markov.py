"""Unit tests for Markov removal-effect attribution (round 9): the
episode/transition builder and the fixed-point absorption against an
independent pure-Python simulator."""

import datetime

import pytest
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import graph

U = 10**12


def _events(spark, rows):
    # rows: (event_id, user_id, type) — timestamps follow event_id order
    data = [
        (
            eid,
            datetime.datetime(2026, 1, 1) + datetime.timedelta(minutes=eid),
            uid,
            ty,
        )
        for eid, uid, ty in rows
    ]
    return spark.createDataFrame(
        data, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )


def test_attribution_transitions_episodes(spark):
    rows = [
        # user 1: view -> click -> purchase | view (unconverted tail)
        (1, 1, "view"),
        (2, 1, "click"),
        (3, 1, "purchase"),
        (4, 1, "view"),
        # user 2: purchase alone (START -> CONV), then click tail
        (5, 2, "purchase"),
        (6, 2, "click"),
    ]
    t = {
        (r.src, r.dst): r.n
        for r in graph.attribution_transitions(_events(spark, rows)).collect()
    }
    assert t == {
        ("START", "view"): 2,
        ("view", "click"): 1,
        ("click", "CONV"): 1,
        ("view", "NULL"): 1,
        ("START", "CONV"): 1,
        ("START", "click"): 1,
        ("click", "NULL"): 1,
    }


def _py_absorb(edges, iters, removed=None):
    """edges: dict (src,dst)->n. K-round integer absorption from START."""
    tot = {}
    for (s, _), n in edges.items():
        tot[s] = tot.get(s, 0) + n
    a = {s: 0 for s in tot}
    for _ in range(iters):
        nxt = {}
        for s in tot:
            acc = 0
            for (f, d), n in edges.items():
                if f != s or (removed is not None and d == removed):
                    continue
                if d == "CONV":
                    v = U
                elif d == "NULL":
                    v = 0
                else:
                    v = a.get(d, 0)
                acc += n * v
            nxt[s] = acc // tot[s]
        a = nxt
    return a.get("START", 0)


def test_markov_removal_matches_python_simulator(spark):
    rows = []
    eid = 0
    # deterministic synthetic journeys over 3 channels
    paths = [
        ["view", "click", "purchase"],
        ["view", "view", "signup"],
        ["click", "purchase"],
        ["signup", "view", "purchase"],
        ["view"],
        ["click", "signup", "click", "purchase"],
    ]
    for uid, path in enumerate(paths):
        for ty in path:
            rows.append((eid, uid, ty))
            eid += 1
    ev = _events(spark, rows)
    trans = graph.attribution_transitions(ev)
    edges = {(r.src, r.dst): r.n for r in trans.collect()}
    out = {
        r.channel: r
        for r in graph.markov_removal_attribution(
            trans, channels=("click", "signup", "view"), iters=4
        ).collect()
    }
    base = _py_absorb(edges, 4)
    assert base > 0
    res = {}
    for c in ("click", "signup", "view"):
        rem = _py_absorb(edges, 4, removed=c)
        res[c] = U - (rem * U) // base
        r = out[c]
        assert r.base_conv_units == str(base)
        assert r.removed_conv_units == str(rem)
        assert r.removal_effect_units == str(res[c])
        assert r.removal_effect == res[c] / 1e12
    tot_pos = sum(max(v, 0) for v in res.values())
    for c, v in res.items():
        assert out[c].attributed_share == max(v, 0) / tot_pos
    # removing 'click' kills the two click->...->purchase journeys:
    # its effect must exceed signup's
    assert res["click"] > res["signup"]


def test_markov_removal_validates_inputs(spark):
    t = spark.createDataFrame(
        [("START", "CONV", 1)], "src string, dst string, n bigint"
    )
    with pytest.raises(ValueError):
        graph.markov_removal_attribution(t, channels=("CONV",))
    with pytest.raises(ValueError):
        graph.markov_removal_attribution(t, channels=("a", "a"))
    with pytest.raises(ValueError):
        graph.markov_removal_attribution(t, channels=("a",), iters=0)
    # names are interpolated into SQL literals: both the quote AND the
    # escape character must be rejected (ADVICE r12 — a trailing
    # backslash would swallow the closing quote)
    with pytest.raises(ValueError):
        graph.markov_removal_attribution(t, channels=("a'b",))
    with pytest.raises(ValueError):
        graph.markov_removal_attribution(t, channels=("a\\",))


def test_markov_removal_no_conversions_gives_nulls(spark):
    rows = [(1, 1, "view"), (2, 1, "click")]
    trans = graph.attribution_transitions(_events(spark, rows))
    out = graph.markov_removal_attribution(
        trans, channels=("click", "view"), iters=3
    ).collect()
    assert {r.channel for r in out} == {"click", "view"}
    for r in out:
        assert r.base_conv_units == "0"
        assert r.removal_effect_units is None
        assert r.attributed_share is None
