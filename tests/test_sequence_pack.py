"""Tests for sequence packing plus the histogram / corr registry shapes."""

import math

import pytest
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import text


def test_sequence_pack_invariants(spark, sf_oracle):
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    out = text.sequence_pack(docs, seq_len=512).collect()
    total_tokens = sum(r.piece_len for r in out)
    # pieces of each doc reassemble it exactly, in order, gap-free
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_by_doc = {
        r.doc_id: r.n_tokens
        for r in docs.select(
            "doc_id", text.token_count(F.col("text")).alias("n_tokens")
        ).collect()
    }
    for did, pieces in by_doc.items():
        pieces.sort(key=lambda r: r.seq_id)
        assert sum(p.piece_len for p in pieces) == n_by_doc[did]
        assert pieces[0].doc_offset == 0
        for a, b in zip(pieces, pieces[1:]):
            assert b.seq_id == a.seq_id + 1  # splits span adjacent seqs
            assert b.doc_offset == a.doc_offset + a.piece_len
            assert a.seq_offset + a.piece_len == 512  # a ends its seq
            assert b.seq_offset == 0  # b starts the next
    # sequences tile [0, 512) without overlap; all but the last are full
    by_seq = {}
    for r in out:
        by_seq.setdefault(r.seq_id, []).append(r)
    assert sorted(by_seq) == list(range(len(by_seq)))  # dense seq ids
    last = max(by_seq)
    for sid, pieces in by_seq.items():
        pieces.sort(key=lambda r: r.seq_offset)
        assert pieces[0].seq_offset == 0
        for a, b in zip(pieces, pieces[1:]):
            assert b.seq_offset == a.seq_offset + a.piece_len
        width = pieces[-1].seq_offset + pieces[-1].piece_len
        assert width == 512 if sid != last else width <= 512
    assert total_tokens == sum(n_by_doc.values())


def test_sequence_pack_skips_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "   "), (3, "")], "doc_id bigint, text string"
    )
    out = text.sequence_pack(docs, seq_len=2)
    rows = out.collect()
    assert {r.doc_id for r in rows} == {1}
    assert sorted((r.seq_id, r.piece_len) for r in rows) == [(0, 2), (1, 1)]


def test_corr_matches_numpy(spark, sf_oracle):
    import numpy as np

    from probability_of_buying_two_products_together_hadoop_project_spark.registry import REGISTRY

    got = {
        r.l_returnflag: (r.corr_qty_price, r.covar_pop, r.beta)
        for r in REGISTRY["agg_corr_regression"].fn(spark, sf_oracle).collect()
    }
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).toPandas()
    for rf, grp in li.groupby("l_returnflag"):
        x = grp.l_quantity.to_numpy()
        y = grp.l_extendedprice.to_numpy()
        assert got[rf][0] == pytest.approx(np.corrcoef(x, y)[0, 1], rel=1e-9)
        assert got[rf][1] == pytest.approx(np.cov(x, y, bias=True)[0, 1], rel=1e-9)
        beta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
        assert got[rf][2] == pytest.approx(beta, rel=1e-9)


def test_histogram_shares_sum_to_one(spark, sf_oracle):
    from probability_of_buying_two_products_together_hadoop_project_spark.registry import REGISTRY

    rows = REGISTRY["value_histogram_events"].fn(spark, sf_oracle).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
        assert r.bin_lo <= r.bin_hi and r.cnt > 0
    for t, rs in by_type.items():
        assert math.isclose(sum(r.share for r in rs), 1.0, rel_tol=1e-12)


def test_export_jsonl_shards_roundtrip(spark, tmp_path, sf_oracle):
    import json
    import os

    from probability_of_buying_two_products_together_hadoop_project_spark.operators import text as text_ops
    from probability_of_buying_two_products_together_hadoop_project_spark.sources import io as eio

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet").limit(100)
    out = str(tmp_path / "shards")
    eio.export_jsonl_shards(docs, out, budget=1000, extra_cols=("lang",))
    # directory-per-shard layout
    shard_dirs = [d for d in os.listdir(out) if d.startswith("shard_id=")]
    assert len(shard_dirs) >= 2
    # read back: every doc present exactly once, fields faithful
    back = spark.read.text(out).collect()
    rows = [json.loads(r.value) for r in back]
    assert len(rows) == 100
    src = {r.doc_id: (r.text, r.lang) for r in docs.collect()}
    for r in rows:
        assert (r["text"], r["lang"]) == src[r["doc_id"]]
    # shard assignment matches the operator (deterministic layout)
    want = {
        r.doc_id: r.shard_id
        for r in text_ops.token_shards(docs, budget=1000).collect()
    }
    got_shards = {
        json.loads(r.value)["doc_id"]: int(r.shard_id)
        for r in spark.read.format("text").load(out).selectExpr(
            "value", "shard_id"
        ).collect()
    }
    assert got_shards == want


def test_sequence_pack_bad_len_raises(spark):
    import pytest as _pytest

    from probability_of_buying_two_products_together_hadoop_project_spark.operators import text as text_ops

    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with _pytest.raises(ValueError):
        text_ops.sequence_pack(df, seq_len=0)
