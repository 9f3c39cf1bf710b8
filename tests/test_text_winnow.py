"""Winnowing fingerprint tests: shared-substring guarantee and
edit-locality (a local edit leaves most fingerprints intact)."""

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


def test_gram_count_exact_no_phantom_char(spark):
    # k=2, w=1: every k-gram is selected (each window is one gram), so a
    # document with L distinct characters yields exactly L - k + 1
    # fingerprints. Pins the split('')-trailing-empty-string fix: with the
    # phantom char the count would be L - k + 2.
    docs = spark.createDataFrame([(1, "abcdef")], ["doc_id", "text"])
    out = text.winnow_fingerprints(docs, k=2, w=1)
    assert out.count() == 5
