"""Unit tests for the integer-DCT perceptual hash (pHash, round 9)."""

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest

from probability_of_buying_two_products_together_hadoop_project_spark.operators import multimodal


def _q6_int(x: float) -> int:
    return int(
        (Decimal(repr(x)) * 1_000_000).quantize(
            Decimal(1), rounding=ROUND_HALF_UP
        )
    )


def _py_phash(text: str, grid: int = 16, block: int = 8) -> str:
    """Pure-Python bit-exact replica of image_phash over the synthetic
    BMP addressing (zero-padded utf-8 body, 48-byte rows)."""
    raw = (text or "").encode("utf-8")
    width = 16
    h = max(-(-len(raw) // 48), 1)
    body = raw.ljust(width * h * 3, b"\x00")
    lum = [[0] * grid for _ in range(grid)]
    for j in range(grid):
        for i in range(grid):
            sy, sx = (j * h) // grid, (i * width) // grid
            off = sy * width * 3 + 3 * sx
            b, g, r = body[off], body[off + 1], body[off + 2]
            lum[j][i] = 114 * b + 587 * g + 299 * r
    C = [
        [
            _q6_int(math.cos(math.pi * (2 * y + 1) * u / (2 * grid)))
            for y in range(grid)
        ]
        for u in range(grid)
    ]
    m1 = [
        [sum(C[u][y] * lum[y][x] for y in range(grid)) for x in range(grid)]
        for u in range(grid)
    ]
    tr = lambda s: s // 1_000_000 if s >= 0 else -((-s) // 1_000_000)  # noqa: E731
    m1 = [[tr(v) for v in row] for row in m1]
    d = [
        [sum(m1[u][x] * C[v][x] for x in range(grid)) for v in range(grid)]
        for u in range(grid)
    ]
    low = [d[u][v] for u in range(block) for v in range(block)][1:]
    med = sorted(low)[(len(low) - 1) // 2]
    return "".join("1" if v > med else "0" for v in low)


def _media(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    return multimodal.media_bmp_from_documents(docs)


def test_image_phash_matches_python_reference(spark):
    texts = ["hello world " * 20, "", "x", "\x7f" * 100, "aAbBcC " * 40]
    got = {
        r.media_id: (r.width, r.height, r.phash)
        for r in multimodal.image_phash(_media(spark, texts)).collect()
    }
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        hh = max(-(-len(raw) // 48), 1)
        assert got[i] == (16, hh, _py_phash(t)), i
    assert all(len(v[2]) == 63 for v in got.values())


def test_image_phash_identical_images_collide(spark):
    rows = multimodal.image_phash(
        _media(spark, ["same text", "same text", "something else entirely"])
    ).collect()
    hs = {r.media_id: r.phash for r in rows}
    assert hs[0] == hs[1]
    assert hs[0] != hs[2]


def test_image_phash_brightness_shift_is_near_invariant(spark):
    # a uniform luma offset lives almost entirely in the DROPPED DC
    # term; with the quantized-integer basis the AC leakage is tiny, so
    # the hashes of a text and its brighter twin stay hamming-close
    # (aHash, which thresholds raw cells on the mean, has no such law)
    base = "the quick brown fox jumps over the lazy dog " * 10
    brighter = "".join(chr(min(ord(c) + 4, 126)) for c in base)
    rows = multimodal.image_phash(_media(spark, [base, brighter])).collect()
    hs = {r.media_id: r.phash for r in rows}
    ham = sum(a != b for a, b in zip(hs[0], hs[1]))
    assert ham <= 8, ham


def test_image_phash_validates_params(spark):
    m = _media(spark, ["x"])
    with pytest.raises(ValueError):
        multimodal.image_phash(m, grid=1)
    with pytest.raises(ValueError):
        multimodal.image_phash(m, grid=8, block=16)
    with pytest.raises(ValueError):
        multimodal.image_phash(m, grid=8, block=1)


def test_dct_table_is_orthogonal_scale(spark):
    # basis sanity: row 0 is all cos(0)=1e6; row u dot row u ~ n/2 * 1e12
    C = multimodal._dct_table(8)
    assert C[:8] == [1_000_000] * 8
    r1 = C[8:16]
    dot = sum(v * v for v in r1)
    assert abs(dot - 4 * 10**12) < 10**7
