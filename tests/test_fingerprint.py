"""Content-fingerprint tests (`relational.content_fingerprint`): the
digest must be invariant to row order and partitioning, sensitive to any
value change, and exact on empty input."""

import hashlib

from probability_of_buying_two_products_together_hadoop_project_spark.operators import relational


def _py_fingerprint(rows):
    total = 0
    for r in rows:
        s = "|".join(str(v) for v in r)
        total += int(hashlib.md5(s.encode()).hexdigest()[:12], 16)
    return str(total)


def _collect(df):
    r = df.collect()[0]
    return (r.dataset, r.n_rows, r.content_hash)


def test_matches_python_and_ignores_order(spark):
    rows = [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    df1 = spark.createDataFrame(rows, "k bigint, v string")
    df2 = spark.createDataFrame(list(reversed(rows)), "k bigint, v string").repartition(7)
    fp1 = _collect(relational.content_fingerprint(df1, ["k", "v"], "t"))
    fp2 = _collect(relational.content_fingerprint(df2, ["k", "v"], "t"))
    assert fp1 == fp2 == ("t", 4, _py_fingerprint(rows))


def test_detects_single_value_change(spark):
    rows = [(1, "a"), (2, "b")]
    changed = [(1, "a"), (2, "B")]
    fp = _collect(relational.content_fingerprint(
        spark.createDataFrame(rows, "k bigint, v string"), ["k", "v"], "t"))
    fp2 = _collect(relational.content_fingerprint(
        spark.createDataFrame(changed, "k bigint, v string"), ["k", "v"], "t"))
    assert fp[1] == fp2[1] and fp[2] != fp2[2]


def test_null_rows_drop_from_hash_in_both_engines(spark):
    """SQL || propagates NULL; concat_ws silently drops it (and would
    make ('a', NULL) collide with (NULL, 'a')). The operator follows the
    ||-semantics: a row with any NULL contributes nothing, but still
    counts in n_rows — and the digest of the remaining rows matches."""
    rows = [(1, "a"), (2, None), (3, "c")]
    df = spark.createDataFrame(rows, "k bigint, v string")
    got = _collect(relational.content_fingerprint(df, ["k", "v"], "t"))
    assert got == ("t", 3, _py_fingerprint([(1, "a"), (3, "c")]))


def test_empty_relation_hashes_to_zero(spark):
    df = spark.createDataFrame([], "k bigint, v string")
    assert _collect(relational.content_fingerprint(df, ["k", "v"], "t")) == ("t", 0, "0")


def test_delta_maintenance_equals_direct(spark):
    """fp(base) + delta == fp(patched base): inserts add, deletes
    subtract exactly; an empty delta is the identity."""
    base_rows = [(1, "a"), (2, "b"), (3, "c")]
    base = spark.createDataFrame(base_rows, "k bigint, v string")
    state = relational.content_fingerprint(base, ["k", "v"], "t")
    delta = spark.createDataFrame(
        [(2, "b", -1), (9, "z", 1), (10, "y", 1)],
        "k bigint, v string, _sign int",
    )
    got = _collect(relational.apply_fingerprint_delta(state, delta, ["k", "v"], "t"))
    patched = [(1, "a"), (3, "c"), (9, "z"), (10, "y")]
    direct = _collect(relational.content_fingerprint(
        spark.createDataFrame(patched, "k bigint, v string"), ["k", "v"], "t"))
    assert got == direct == ("t", 4, _py_fingerprint(patched))
    empty = spark.createDataFrame([], "k bigint, v string, _sign int")
    assert _collect(
        relational.apply_fingerprint_delta(state, empty, ["k", "v"], "t")
    ) == _collect(state)


def test_delta_delete_everything_returns_zero(spark):
    base_rows = [(1, "a"), (2, "b")]
    base = spark.createDataFrame(base_rows, "k bigint, v string")
    state = relational.content_fingerprint(base, ["k", "v"], "t")
    delta = spark.createDataFrame(
        [(1, "a", -1), (2, "b", -1)], "k bigint, v string, _sign int"
    )
    assert _collect(
        relational.apply_fingerprint_delta(state, delta, ["k", "v"], "t")
    ) == ("t", 0, "0")
