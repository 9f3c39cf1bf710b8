"""Winnowing fingerprint tests: shared-substring guarantee,
edit-locality (a local edit leaves most fingerprints intact), and full
value equality against an independent pure-Python XXH64 + winnowing
reference (reference_winnow.py) — including over the real sf0.01
documents table."""

import os

from pyspark.sql import functions as F

import reference_winnow as ref
from probability_of_buying_two_products_together_hadoop_project_spark.operators import text

K, W = 5, 4
BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
EDIT = BASE.replace("river", "ocean")  # local edit
OTHER = "completely unrelated text with no overlap whatsoever in content"


def _fps(spark, rows):
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = text.winnow_fingerprints(docs, k=K, w=W)
    fps = {}
    for r in out.collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    return fps


def test_identical_docs_identical_fps(spark):
    fps = _fps(spark, [(1, BASE), (2, BASE)])
    assert fps[1] == fps[2]


def test_local_edit_keeps_most_fps(spark):
    fps = _fps(spark, [(1, BASE), (2, EDIT), (3, OTHER)])
    inter = len(fps[1] & fps[2])
    union = len(fps[1] | fps[2])
    assert inter / union > 0.5  # local edit -> high overlap
    assert len(fps[1] & fps[3]) == 0  # no shared >= k+w-1 substrings


def test_guarantee_shared_long_substring(spark):
    # two docs sharing a substring of length >= k + w - 1 = 8 must share
    # at least one fingerprint (the winnowing guarantee)
    shared = "abcdefghij"  # length 10 >= 8
    fps = _fps(spark, [(1, f"xxx {shared} yyy"), (2, f"zzz {shared} www")])
    assert fps[1] & fps[2]


def test_short_doc_yields_one_fp(spark):
    fps = _fps(spark, [(1, "ab")])  # shorter than k -> single gram of whole text
    assert len(fps[1]) == 1


def test_python_xxhash64_matches_spark(spark):
    """The reference XXH64 (spec implementation) must agree with Spark's
    xxhash64 expression on strings and on chained bigint args."""
    samples = ["a", "z", " ", "é", "hello", "0", "winnow"]
    rows = spark.createDataFrame([(s,) for s in samples], ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    ).collect()
    for r in rows:
        assert ref.spark_xxhash64_str(r["s"]) == r["h"], r["s"]
    pairs = [(1, 2), (-5, 7), (0, 0), (2**62, -(2**62))]
    got = (
        spark.createDataFrame(pairs, "x long, y long")
        .select("x", "y", F.xxhash64("x", "y").alias("h"))
        .collect()
    )
    for r in got:
        assert ref.spark_xxhash64_longs(r["x"], r["y"]) == r["h"], (r["x"], r["y"])


def _ref_sets(rows, k=5, w=4):
    return {i: ref.winnow_fingerprints_ref(t, k, w) for i, t in rows}


def test_fingerprint_values_equal_python_reference(spark):
    rows = [(1, BASE), (2, EDIT), (3, OTHER), (4, "ab"), (5, "  A  b\tc  ")]
    assert _fps(spark, rows) == _ref_sets(rows, K, W)


def test_fingerprint_values_equal_python_reference_sf001(spark):
    """Full value parity over the REAL sf0.01 documents table (500 docs):
    the strongest available winnow evidence, since xxhash64 has no DuckDB
    twin for a driver oracle."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_CORRECTNESS", "/root/testdata/sf0.01")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    got = {}
    for r in text.winnow_fingerprints(docs, k=K, w=W).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    want = _ref_sets(rows, K, W)
    assert got == want


def test_gram_count_exact_no_phantom_char(spark):
    # k=2, w=1: every k-gram is selected (each window is one gram), so a
    # document with L distinct characters yields exactly L - k + 1
    # fingerprints. Pins the split('')-trailing-empty-string fix: with the
    # phantom char the count would be L - k + 2.
    docs = spark.createDataFrame([(1, "abcdef")], ["doc_id", "text"])
    out = text.winnow_fingerprints(docs, k=2, w=1)
    assert out.count() == 5


def _fps_verified(spark, rows):
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = text.winnow_fingerprints_verified(docs, k=K, w=W)
    fps = {}
    for r in out.collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    return fps


def test_verified_variant_winnowing_properties(spark):
    """The md5-hex verified twin must satisfy the same winnowing
    properties as the xxhash64 production variant: identical docs ->
    identical sets, shared >=k+w-1 substring -> shared fingerprint,
    disjoint docs -> disjoint sets, local edit -> high overlap."""
    fps = _fps_verified(
        spark, [(1, BASE), (2, BASE), (3, EDIT), (4, OTHER)]
    )
    assert fps[1] == fps[2]
    inter, union = len(fps[1] & fps[3]), len(fps[1] | fps[3])
    assert inter / union > 0.5
    assert not fps[1] & fps[4]
    shared = "abcdefghij"
    f2 = _fps_verified(spark, [(1, f"xxx {shared} yyy"), (2, f"zzz {shared} www")])
    assert f2[1] & f2[2]


def test_verified_variant_matches_python_reference(spark):
    """Full value equality against an independent pure-Python md5-hex
    winnow on the same corpus (mirrors the xxhash64 parity suite)."""
    import hashlib
    import re

    def py_winnow(txt):
        norm = re.sub(r"\s+", " ", txt.strip().lower())
        if len(norm) < K + W - 1:
            return set()
        hs = [
            hashlib.md5(norm[i : i + K].encode()).hexdigest()
            for i in range(len(norm) - K + 1)
        ]
        return {min(hs[j : j + W]) for j in range(len(hs) - W + 1)}

    rows = [(1, BASE), (2, EDIT), (3, OTHER), (4, "tiny"), (5, "  Mixed   CASE  Text with   Spaces  ")]
    got = _fps_verified(spark, rows)
    for did, txt in rows:
        assert got.get(did, set()) == py_winnow(txt), did
