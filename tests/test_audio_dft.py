"""audio_dft_energy: exact integer DFT band energies — python reference
parity over the synthetic WAV fixture, plus a planted-tone check."""

import math
import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from probability_of_buying_two_products_together_hadoop_project_spark.operators import (
    multimodal,
)


def py_dft(texts, n_window=64, freqs=(1, 4, 8, 16)):
    cos_u, sin_u = multimodal._dft_tables(n_window)
    out = {}
    for mid, t in texts.items():
        raw = t.encode("utf-8")
        samples = [(b - 128) * 256 for b in raw]
        for w in range(0, len(samples), n_window):
            chunk = samples[w : w + n_window]
            row = {"n": len(chunk)}
            for f in freqs:
                re = sum(
                    v * cos_u[(m * f) % n_window] for m, v in enumerate(chunk)
                )
                im = sum(
                    v * sin_u[(m * f) % n_window] for m, v in enumerate(chunk)
                )
                row[f] = re * re + im * im
            out[(mid, w // n_window)] = row
    return out


def _run(spark, texts, **kw):
    docs = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    media = multimodal.media_wav_from_documents(docs)
    return multimodal.audio_dft_energy(media, **kw)


def test_dft_energy_matches_python(spark):
    rng = random.Random(9)
    texts = {
        i: "".join(chr(rng.randint(32, 126)) for _ in range(rng.randint(10, 300)))
        for i in range(12)
    }
    got = {
        (r.media_id, r.win): r for r in _run(spark, texts).collect()
    }
    want = py_dft(texts)
    assert set(got) == set(want)
    for key, w in want.items():
        r = got[key]
        assert r.n_in_window == w["n"]
        for f in (1, 4, 8, 16):
            assert int(getattr(r, f"e{f}_u2")) == w[f]
            assert getattr(r, f"e{f}") == pytest.approx(w[f] / 1e12, rel=1e-12)


def test_dft_energy_planted_tone_dominates_its_bin(spark):
    # ASCII-safe cosine at bin 4 of a 64-sample window: byte
    # 64 + 50*cos(2*pi*4*n/64) stays in 14..114 (single-byte utf-8)
    n = 64 * 4
    text = "".join(
        chr(64 + round(50 * math.cos(2 * math.pi * 4 * m / 64))) for m in range(n)
    )
    rows = _run(spark, {1: text}).collect()
    assert len(rows) == 4  # four full windows
    for r in rows:
        e4 = int(r.e4_u2)
        others = [int(r.e1_u2), int(r.e8_u2), int(r.e16_u2)]
        # the tone bin carries orders of magnitude more energy than
        # the other (non-DC) bins — quantized-byte leakage is tiny
        assert all(e4 > 100 * o for o in others)


def test_dft_energy_validation(spark):
    docs = {1: "hello world"}
    with pytest.raises(ValueError):
        _run(spark, docs, n_window=1)
    with pytest.raises(ValueError):
        _run(spark, docs, freqs=(99,))
    with pytest.raises(ValueError):
        _run(spark, docs, freqs=())
