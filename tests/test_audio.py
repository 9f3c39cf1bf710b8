"""WAV codec + audio operator tests.

The reference repo has no media handling (SURVEY.md §2.3: multimodal
columns are the brief's extension surface); these pin the pure-Python
RIFF/WAVE codec (`operators/multimodal.py`) the audio registry oracles
rely on: canonical round-trips, true chunk walking, validation, and
spark-side feature/resample parity with independent Python mirrors.
"""

import struct

import pytest

from probability_of_buying_two_products_together_hadoop_project_spark.operators import multimodal as mm
from pyspark.sql import functions as F


def _frames(samples):
    return b"".join(struct.pack("<h", s) for s in samples)


def test_wav_roundtrip_mono():
    samples = [0, 1, -1, 32767, -32768, 12345, -54]
    payload = mm.encode_wav(8000, 1, _frames(samples))
    rate, ch, frames = mm.decode_wav(payload)
    assert (rate, ch) == (8000, 1)
    assert frames == _frames(samples)
    assert len(payload) == 44 + 2 * len(samples)


def test_wav_roundtrip_stereo_and_empty():
    stereo = _frames([10, -10, 20, -20])  # two frames, two channels
    rate, ch, frames = mm.decode_wav(mm.encode_wav(44100, 2, stereo))
    assert (rate, ch, frames) == (44100, 2, stereo)
    rate, ch, frames = mm.decode_wav(mm.encode_wav(8000, 1, b""))
    assert (rate, ch, frames) == (8000, 1, b"")


def test_wav_chunk_walk_skips_foreign_chunks():
    """fmt and data separated by LIST and an ODD-sized chunk (RIFF pads
    odd chunks to even offsets) must still decode."""
    body = _frames([5, -6, 7])
    base = mm.encode_wav(16000, 1, body)
    fmt_chunk = base[12:36]           # 'fmt ' + size + 16 bytes
    data_chunk = base[36:]            # 'data' + size + frames
    odd = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + len(fmt_chunk) + len(odd) + len(lst) + len(data_chunk))
        + b"WAVE"
        + fmt_chunk
        + odd
        + lst
        + data_chunk
    )
    assert mm.decode_wav(payload) == (16000, 1, body)


def test_wav_validation_errors():
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFX" + b"\x00" * 40)
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFF" + struct.pack("<I", 4) + b"AVI ")
    good = mm.encode_wav(8000, 1, _frames([1, 2]))
    with pytest.raises(ValueError):  # data chunk missing
        mm.decode_wav(good[:36])
    with pytest.raises(ValueError):
        mm.encode_wav(8000, 1, b"\x01")  # half a frame
    with pytest.raises(ValueError):
        mm.encode_wav(0, 1, b"")
    # non-PCM format code and non-16-bit width are honest NotImplemented
    bad_fmt = bytearray(good)
    struct.pack_into("<H", bad_fmt, 20, 3)  # IEEE float
    with pytest.raises(NotImplementedError):
        mm.decode_wav(bytes(bad_fmt))
    bad_bits = bytearray(good)
    struct.pack_into("<H", bad_bits, 34, 8)
    struct.pack_into("<H", bad_bits, 32, 1)  # block align for 8-bit mono
    with pytest.raises(NotImplementedError):
        mm.decode_wav(bytes(bad_bits))
    # zero-channel fmt must raise descriptively, not ZeroDivisionError
    zero_ch = bytearray(good)
    struct.pack_into("<H", zero_ch, 22, 0)
    struct.pack_into("<H", zero_ch, 32, 0)
    with pytest.raises(ValueError, match="zero channels"):
        mm.decode_wav(bytes(zero_ch))


def test_wav_from_text_sample_law():
    """sample i == (utf-8 byte i - 128) * 256 — the contract the DuckDB
    oracles regenerate."""
    text = "héllo wörld"  # multi-byte utf-8 on purpose
    rate, ch, frames = mm.decode_wav(mm.wav_from_text(text))
    raw = text.encode("utf-8")
    got = list(struct.unpack(f"<{len(raw)}h", frames))
    assert got == [(b - 128) * 256 for b in raw]
    assert (rate, ch) == (8000, 1)
    # empty text -> header-only file, zero frames
    assert mm.decode_wav(mm.wav_from_text(""))[2] == b""


def _py_features(text):
    raw = (text or "").encode("utf-8")
    s = [(b - 128) * 256 for b in raw]
    zc = sum(1 for a, b in zip(s, s[1:]) if a * b < 0)
    return (
        len(s),
        sum(s),
        sum(x * x for x in s),
        max((abs(x) for x in s), default=0),
        zc,
    )


def test_audio_features_verified_spark(spark):
    texts = ["abc", "", "zzz\x00zzz", "héllo wörld", "\x7f\x00" * 5, "a"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    media = mm.media_wav_from_documents(docs)
    # header-derived meta matches the synthesis parameters
    meta = {r.media_id: r.meta for r in media.collect()}
    for i, t in enumerate(texts):
        assert meta[i].sample_rate == 8000
        assert meta[i].channels == 1
        assert meta[i].n_bytes == 44 + 2 * len(t.encode("utf-8"))
    got = {
        r.media_id: (r.n_samples, r.s_sum, r.sq_sum, r.peak_abs, r.zero_crossings)
        for r in mm.audio_features_verified(media).collect()
    }
    assert got == {i: _py_features(t) for i, t in enumerate(texts)}


def test_resample_decimate_mirror(spark):
    texts = ["abcdefgh", "", "x", "héllo wörld again and again"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    media = mm.media_wav_from_documents(docs)
    got = {
        r.media_id: (r.sample_rate, r.n_frames, list(r.samples))
        for r in mm.resample_decimate(media, factor=4).collect()
    }
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        want = [(b - 128) * 256 for b in raw[::4]]
        assert got[i] == (2000, len(want), want)


def test_resample_factor_one_is_identity(spark):
    docs = spark.createDataFrame([(0, "identity")], "doc_id bigint, text string")
    media = mm.media_wav_from_documents(docs)
    row = mm.resample_decimate(media, factor=1).collect()[0]
    src = media.select("payload").collect()[0][0]
    assert bytes(row.payload) == bytes(src)
    assert row.sample_rate == 8000
    with pytest.raises(ValueError):
        mm.resample_decimate(media, factor=0)


def _py_fir(samples, factor, taps):
    den = sum(taps)
    out = []
    n = len(samples)
    for m in range(0, (n + factor - 1) // factor):
        acc = sum(
            t * (samples[m * factor + k] if m * factor + k < n else 0)
            for k, t in enumerate(taps)
        )
        q, r = divmod(abs(acc), den)
        out.append(q if acc >= 0 else -q)  # truncate toward zero
    return out


def test_resample_fir_mirror(spark):
    texts = ["abcdefgh", "", "x", "héllo wörld again and again", "\x00\x7f" * 9]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    media = mm.media_wav_from_documents(docs)
    got = {
        r.media_id: (r.sample_rate, r.n_frames, list(r.samples))
        for r in mm.resample_fir(media, factor=4, taps=(1, 2, 1)).collect()
    }
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        src = [(b - 128) * 256 for b in raw]
        want = _py_fir(src, 4, (1, 2, 1))
        assert got[i] == (2000, len(want), want)


def test_resample_fir_single_tap_equals_decimate(spark):
    """taps=(1,) degenerates to pure decimation — same payload bytes."""
    docs = spark.createDataFrame(
        [(0, "sixteen characters of input!")], "doc_id bigint, text string"
    )
    media = mm.media_wav_from_documents(docs)
    fir = mm.resample_fir(media, factor=3, taps=(1,)).collect()[0]
    dec = mm.resample_decimate(media, factor=3).collect()[0]
    assert bytes(fir.payload) == bytes(dec.payload)
    assert list(fir.samples) == list(dec.samples)


def test_resample_fir_truncation_toward_zero():
    """Negative accumulators must truncate toward zero (DuckDB // and
    Spark div), not floor like Python //: (-3) avg'd by 4 -> 0, not -1."""
    assert _py_fir([-1, -1, -1], 4, (1, 2, 1)) == [-1]  # acc=-4 -> -1
    assert _py_fir([-1, -1, 0], 4, (1, 2, 1)) == [0]    # acc=-3 -> 0  (floor would give -1)
    import numpy as np

    acc = np.asarray([-3, 3, -4, 5], dtype=np.int64)
    out = np.sign(acc) * (np.abs(acc) // 4)
    assert list(out) == [0, 0, -1, 1]


def test_resample_fir_validation(spark):
    docs = spark.createDataFrame([(0, "abc")], "doc_id bigint, text string")
    media = mm.media_wav_from_documents(docs)
    with pytest.raises(ValueError):
        mm.resample_fir(media, factor=0)
    with pytest.raises(ValueError):
        mm.resample_fir(media, factor=2, taps=())
    with pytest.raises(ValueError):
        mm.resample_fir(media, factor=2, taps=(1, -1))


def test_resample_fir_stereo_per_channel(spark):
    """The tap window must convolve each channel independently — frames
    stay interleaved (L, R) pairs, never cross-channel mixes."""
    import numpy as np

    stereo = _frames([100, -100, 200, -200, 300, -300, 400, -400])
    payload = mm.encode_wav(8000, 2, stereo)
    media = spark.createDataFrame(
        [(7, bytearray(payload))], "media_id bigint, payload binary"
    )
    row = mm.resample_fir(media, factor=2, taps=(1, 2, 1)).collect()[0]
    fr = np.frombuffer(
        mm.decode_wav(payload)[2], dtype="<i2"
    ).reshape(-1, 2)
    left = _py_fir(list(fr[:, 0]), 2, (1, 2, 1))
    right = _py_fir(list(fr[:, 1]), 2, (1, 2, 1))
    inter = [v for pair in zip(left, right) for v in pair]
    assert (row.sample_rate, row.channels, row.n_frames) == (4000, 2, len(left))
    assert list(row.samples) == inter


def test_resample_stereo_keeps_frames_together():
    """Decimation must drop whole FRAMES, not interleaved samples."""
    stereo = _frames([1, -1, 2, -2, 3, -3, 4, -4])  # 4 frames x 2 ch
    payload = mm.encode_wav(8000, 2, stereo)
    # exercise the kernel directly: decode, stride frames, re-encode
    rate, ch, frames = mm.decode_wav(payload)
    import numpy as np

    fr = np.frombuffer(frames, dtype="<i2").reshape(-1, ch)
    kept = np.ascontiguousarray(fr[::2]).tobytes()
    assert kept == _frames([1, -1, 3, -3])
    r2, c2, f2 = mm.decode_wav(mm.encode_wav(rate // 2, ch, kept))
    assert (r2, c2, f2) == (4000, 2, kept)


def _py_rational(samples, up, down, taps):
    den = sum(taps)
    n = len(samples)
    n_out = (n * up + down - 1) // down
    out = []
    for m in range(n_out):
        acc = 0
        for k, t in enumerate(taps):
            pos = m * down + k
            if pos % up == 0 and pos // up < n:
                acc += t * up * samples[pos // up]
        q = abs(acc) // den
        v = q if acc >= 0 else -q
        out.append(max(-32768, min(32767, v)))
    return out


def test_resample_rational_matches_python_reference(spark):
    texts = ["abcdefghij", "", "x", "héllo wörld again", "\x00\x7f" * 7]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    media = mm.media_wav_from_documents(docs)
    got = {
        r.media_id: (r.sample_rate, r.n_frames, list(r.samples))
        for r in mm.resample_rational(media, up=3, down=2).collect()
    }
    for i, t in enumerate(texts):
        src = [(b - 128) * 256 for b in t.encode("utf-8")]
        want = _py_rational(src, 3, 2, (1, 2, 1))
        assert got[i] == (12000, len(want), want), i


def test_resample_rational_up1_equals_fir(spark):
    docs = spark.createDataFrame(
        [(0, "some audio-like content here")], "doc_id bigint, text string"
    )
    media = mm.media_wav_from_documents(docs)
    rat = mm.resample_rational(media, up=1, down=4, taps=(1, 2, 1)).collect()[0]
    fir = mm.resample_fir(media, factor=4, taps=(1, 2, 1)).collect()[0]
    assert list(rat.samples) == list(fir.samples)
    assert rat.sample_rate == fir.sample_rate == 2000


def test_resample_rational_validation(spark):
    docs = spark.createDataFrame([(0, "abc")], "doc_id bigint, text string")
    media = mm.media_wav_from_documents(docs)
    with pytest.raises(ValueError):
        mm.resample_rational(media, up=0, down=2)
    with pytest.raises(ValueError):
        mm.resample_rational(media, up=2, down=2, taps=())
