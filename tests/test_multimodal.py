"""Multimodal plumbing tests: pure-Python BMP codec round-trips, media
table header metadata agrees with the decoder, features are
decoder-derived for BMP payloads and fall back cleanly otherwise."""

import math

import pytest
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import multimodal


def test_bmp_encode_decode_roundtrip():
    # 3x2 image with distinct channel values per pixel, incl. a width
    # whose row length (9 bytes) needs 3 padding bytes
    px = bytes(range(3 * 2 * 3))
    payload = multimodal.encode_bmp(3, 2, px)
    assert payload[:2] == b"BM"
    w, h, body = multimodal.decode_bmp(payload)
    assert (w, h) == (3, 2)
    assert body == px


def test_bmp_from_text_geometry_and_content():
    text = "hello multimodal world"
    payload = multimodal.bmp_from_text(text, width=16)
    w, h, body = multimodal.decode_bmp(payload)
    raw = text.encode("utf-8")
    assert w == 16
    assert h == max((len(raw) + 47) // 48, 1)
    assert body[: len(raw)] == raw  # pixel bytes ARE the text bytes
    assert all(b == 0 for b in body[len(raw) :])


def test_decode_image_rejects_non_bmp():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_image_features_are_decoder_derived():
    # solid-color 2x2: B=10 G=20 R=30 everywhere -> exact channel means
    px = bytes([10, 20, 30] * 4)
    payload = multimodal.encode_bmp(2, 2, px)
    f = multimodal.image_features(payload)
    assert f[0] == 2.0 and f[1] == 2.0
    assert f[2] == 10.0 and f[3] == 20.0 and f[4] == 30.0
    want_luma = 0.114 * 10 + 0.587 * 20 + 0.299 * 30
    assert math.isclose(f[5], round(want_luma, 6))
    assert f[6] == 0.0  # solid color -> zero luma std
    assert f[7] == 1.0  # every pixel nonzero


def test_media_bmp_table_and_features(spark):
    docs = spark.createDataFrame(
        [(1, "a" * 10), (2, "b" * 100), (3, "")], ["doc_id", "text"]
    )
    media = multimodal.media_bmp_from_documents(docs)
    rows = {r["media_id"]: r for r in media.collect()}
    # meta.height is parsed JVM-side from the BMP header; cross-check the
    # Python decoder agrees payload-by-payload
    for mid, r in rows.items():
        w, h, _ = multimodal.decode_bmp(bytes(r["payload"]))
        assert r["meta"]["width"] == w == 16
        assert r["meta"]["height"] == h
        assert r["meta"]["mime"] == "image/bmp"
        assert r["meta"]["n_bytes"] == len(r["payload"])
    feats = {
        r["media_id"]: r
        for r in multimodal.extract_features(media, dim=8).collect()
    }
    for mid, r in feats.items():
        want = multimodal.image_features(bytes(rows[mid]["payload"]))
        got = [float(x) for x in r["feature"]]
        assert len(got) == 8
        for g, w_ in zip(got, want):
            assert math.isclose(g, w_, rel_tol=1e-6), (mid, got, want)
    # 100 'b's -> 3 rows of 16px; mean over channels reflects text bytes
    assert feats[2]["feature"][1] == 3.0


def test_extract_features_fallback_for_non_bmp(spark):
    media = multimodal.media_from_documents(
        spark.createDataFrame([(7, "plain text payload")], ["doc_id", "text"])
    )
    out = multimodal.extract_features(media, dim=4).collect()
    assert len(out) == 1
    assert len(out[0]["feature"]) == 4
    assert out[0]["n_bytes"] == len("plain text payload")
