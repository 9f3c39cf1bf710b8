"""Batch MERGE INTO (CDC apply with tombstone deletes) over the bucketed
parquet state table — the batch face of the streaming upsert sink.

Crash-safety of the swap protocol is covered by the streaming tests
(tests/test_streaming.py) on the now-shared merge engine; these tests pin
the CDC semantics: latest-version-wins upserts, winning/losing tombstones,
idempotent replay, and only-touched-bucket rewrites.
"""

import os

import pytest

from probability_of_buying_two_products_together_hadoop_project_spark.streaming.streams import (
    merge_into_parquet,
)

SCHEMA = "k bigint, v string, ver bigint, seq bigint, is_delete boolean"


def _apply(spark, path, rows):
    merge_into_parquet(
        spark.createDataFrame(rows, SCHEMA),
        str(path),
        key_cols=("k",),
        order_col="ver",
        tiebreak_col="seq",
        delete_col="is_delete",
        n_buckets=4,
    )


def _state(spark, path):
    return {
        r.k: (r.v, r.ver)
        for r in spark.read.parquet(str(path)).collect()
    }


def test_merge_upsert_update_delete(spark, tmp_path):
    p = tmp_path / "state"
    _apply(spark, p, [(1, "a", 1, 1, False), (2, "b", 1, 2, False)])
    assert _state(spark, p) == {1: ("a", 1), 2: ("b", 1)}
    # update key 1, insert key 3, delete key 2
    _apply(
        spark, p,
        [(1, "a2", 2, 3, False), (3, "c", 1, 4, False), (2, None, 2, 5, True)],
    )
    assert _state(spark, p) == {1: ("a2", 2), 3: ("c", 1)}
    # the tombstone column never persists into the table
    assert "is_delete" not in spark.read.parquet(str(p)).columns


def test_out_of_order_tombstone_loses(spark, tmp_path):
    p = tmp_path / "state"
    _apply(spark, p, [(1, "live", 5, 1, False)])
    # a late-arriving delete with an OLDER version must be a no-op
    _apply(spark, p, [(1, None, 3, 2, True)])
    assert _state(spark, p) == {1: ("live", 5)}
    # and a NEWER delete wins
    _apply(spark, p, [(1, None, 6, 3, True)])
    assert _state(spark, p) == {}


def test_delete_nonexistent_key_is_noop(spark, tmp_path):
    p = tmp_path / "state"
    _apply(spark, p, [(1, "a", 1, 1, False)])
    _apply(spark, p, [(42, None, 1, 2, True)])
    assert _state(spark, p) == {1: ("a", 1)}


def test_replay_is_idempotent(spark, tmp_path):
    p = tmp_path / "state"
    batch = [(1, "a", 1, 1, False), (2, "b", 1, 2, True), (3, "c", 2, 3, False)]
    _apply(spark, p, batch)
    first = _state(spark, p)
    _apply(spark, p, batch)  # CDC load re-delivered
    assert _state(spark, p) == first


def test_only_touched_buckets_rewritten(spark, tmp_path):
    p = tmp_path / "state"
    # spread keys over buckets, snapshot mtimes, then touch ONE key
    _apply(spark, p, [(k, f"v{k}", 1, k, False) for k in range(20)])
    dirs = [d for d in os.listdir(p) if d.startswith("bucket=")]
    assert len(dirs) > 1
    before = {d: os.stat(os.path.join(p, d)).st_mtime_ns for d in dirs}
    _apply(spark, p, [(0, "v0b", 2, 100, False)])
    after = {d: os.stat(os.path.join(p, d)).st_mtime_ns for d in dirs}
    changed = [d for d in dirs if before[d] != after[d]]
    assert len(changed) == 1
    assert _state(spark, p)[0] == ("v0b", 2)


def test_upsert_without_delete_col(spark, tmp_path):
    # delete_col=None keeps the pure upsert contract (streaming parity)
    p = tmp_path / "state"
    df = spark.createDataFrame([(1, "x", 1, 1)], "k bigint, v string, ver bigint, seq bigint")
    merge_into_parquet(df, str(p), ("k",), "ver", "seq", n_buckets=4)
    df2 = spark.createDataFrame([(1, "y", 2, 2)], "k bigint, v string, ver bigint, seq bigint")
    merge_into_parquet(df2, str(p), ("k",), "ver", "seq", n_buckets=4)
    assert _state(spark, p) == {1: ("y", 2)}
