"""Edge-case probes for the windowed pair semantics (SURVEY.md §2.2).

Each probe is a minimal basket exercising one rule of the reference
contract (/root/reference/src/CrystalBallPair.java:38-64).
"""

from probability_of_buying_two_products_together_hadoop_project_spark.operators import basket


def _pairs(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    rows = basket.cooccurrence_counts(basket.baskets_from_text(df)).collect()
    return {(r["item"], r["neighbor"]): r["pair_cnt"] for r in rows}


def test_customer_only_line_emits_nothing(spark):
    assert _pairs(spark, ["Alice"]) == {}


def test_single_item_emits_nothing(spark):
    # one item: it is the last token, so never a current item (rule 1)
    assert _pairs(spark, ["Alice 7"]) == {}


def test_all_identical_items_emit_nothing(spark):
    # window stops immediately at the re-occurrence -> empty windows
    assert _pairs(spark, ["B 7 7 7 7"]) == {}


def test_alternating_items(spark):
    # D 1 2 1 2 1: windows: 1->[2], 2->[1], 1->[2], 2->[1]; last 1 skipped
    assert _pairs(spark, ["D 1 2 1 2 1"]) == {("1", "2"): 2, ("2", "1"): 2}


def test_multiplicity_counted(spark):
    # E 1 2 2 3: 1's window is [2 2 3] -> (1,2) counts twice; the first
    # 2's window is empty (stops at the immediate re-occurrence); the
    # second 2's window is [3]
    assert _pairs(spark, ["E 1 2 2 3"]) == {
        ("1", "2"): 2,
        ("1", "3"): 1,
        ("2", "3"): 1,
    }


def test_window_stops_before_reoccurrence(spark):
    # F 5 6 5 7: 5's window is [6] (stops before the second 5);
    # 6's window is [5 7]; second 5's window is [7]
    assert _pairs(spark, ["F 5 6 5 7"]) == {
        ("5", "6"): 1,
        ("6", "5"): 1,
        ("6", "7"): 1,
        ("5", "7"): 1,
    }


def test_whitespace_separators(spark):
    # tabs / runs of spaces split identically to Java's \s+ split
    tabbed = _pairs(spark, ["G\t1\t 2   3"])
    plain = _pairs(spark, ["G 1 2 3"])
    assert tabbed == plain and plain == {("1", "2"): 1, ("1", "3"): 1, ("2", "3"): 1}


def test_stripes_cap_equals_full_when_n_large(spark, sf_smoke):
    """max_neighbors >= every per-item cardinality must reproduce the
    uncapped stripes exactly; a small cap truncates to the top-N by prob
    while keeping the FULL-distribution probabilities."""
    import os

    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_smoke, "lineitem.parquet"))
    b = basket.baskets_from_lineitem(li)
    full = {r["item"]: r["stripe"] for r in basket.cooccurrence_stripes(b).collect()}
    max_card = max(len(s) for s in full.values())
    capped_hi = {
        r["item"]: r["stripe"]
        for r in basket.cooccurrence_stripes(b, max_neighbors=max_card).collect()
    }
    assert capped_hi == full
    capped_2 = {
        r["item"]: r["stripe"]
        for r in basket.cooccurrence_stripes(b, max_neighbors=2).collect()
    }
    assert set(capped_2) == set(full)
    for item, stripe in capped_2.items():
        assert len(stripe) <= 2
        # capped entries are a subset of the full stripe with identical probs
        for n, p in stripe.items():
            assert full[item][n] == p
        # and they are the top-by-prob entries (ties broken by neighbor asc)
        want = sorted(full[item].items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        assert sorted(stripe.items()) == sorted(want)


def test_lineitem_bridge_preserves_linenumber_order(spark, sf_smoke):
    import os

    li = spark.read.parquet(os.path.join(sf_smoke, "lineitem.parquet"))
    b = basket.baskets_from_lineitem(li)
    row = b.limit(1).collect()[0]
    expected = [
        str(r["l_partkey"])
        for r in li.filter(li.l_orderkey == row["basket_id"])
        .orderBy("l_linenumber")
        .collect()
    ]
    assert row["items"] == expected
