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


def test_decode_image_rejects_unsupported_formats():
    # JPEG magic: genuinely needs a codec library -> honest stub branch
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)
    # PNG signature but no IHDR -> the real decoder rejects it
    with pytest.raises(ValueError, match="missing IHDR"):
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


def test_png_encode_decode_roundtrip_all_filters():
    """encode_png('mixed') cycles scanlines through filter types 0..4, so
    a >=5-row image round-tripping bit-exactly proves every unfilter
    branch (None/Sub/Up/Average/Paeth) against stdlib zlib."""
    import random

    rng = random.Random(11)
    w, h = 7, 9  # odd width exercises the a/c edge cases at row starts
    px = bytes(rng.randrange(256) for _ in range(w * h * 3))
    payload = multimodal.encode_png(w, h, px)
    assert payload.startswith(multimodal.PNG_SIG)
    w2, h2, out = multimodal.decode_png(payload)
    assert (w2, h2) == (w, h)
    assert out == px
    # filter-0-only variant must decode to the same pixels
    w3, h3, out3 = multimodal.decode_png(
        multimodal.encode_png(w, h, px, filter_mode="none")
    )
    assert out3 == px


def test_png_from_text_geometry_and_content():
    text = "b" * 100
    payload = multimodal.png_from_text(text, width=16)
    w, h, body = multimodal.decode_png(payload)
    raw = text.encode()
    assert w == 16 and h == max((len(raw) + 47) // 48, 1)
    assert body[: len(raw)] == raw
    assert all(b == 0 for b in body[len(raw):])


def test_decode_image_swaps_png_to_bgr():
    # one pixel R=1 G=2 B=3: PNG stores RGB, decode_image contract is BGR
    payload = multimodal.encode_png(1, 1, bytes([1, 2, 3]))
    w, h, bgr = multimodal.decode_image(payload)
    assert (w, h) == (1, 1) and bgr == bytes([3, 2, 1])


def test_png_rejects_unsupported_variants():
    # alpha/16-bit/Adam7 are now real decode paths (r05); what remains
    # unsupported is a nonstandard compression method byte
    import struct as _s
    import zlib as _z

    ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 2, 1, 0, 0)  # compression method 1
    chunk = (
        _s.pack(">I", len(ihdr))
        + b"IHDR" + ihdr
        + _s.pack(">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(NotImplementedError, match="unsupported"):
        multimodal.decode_png(multimodal.PNG_SIG + chunk)


def test_media_png_table_and_pixel_decode(spark):
    docs = spark.createDataFrame(
        [(0, "short"), (1, "x" * 70), (2, "b" * 100)], ["doc_id", "text"]
    )
    media = multimodal.media_png_from_documents(docs)
    rows = {r["media_id"]: r for r in media.collect()}
    for mid, r in rows.items():
        w, h, _ = multimodal.decode_png(bytes(r["payload"]))
        assert r["meta"]["width"] == w == 16
        assert r["meta"]["height"] == h  # JVM-side IHDR parse agrees
        assert r["meta"]["mime"] == "image/png"
        assert r["meta"]["n_bytes"] == len(r["payload"])
    dec = {r["media_id"]: r for r in multimodal.decode_png_pixels(media).collect()}
    for mid, text in ((0, "short"), (1, "x" * 70), (2, "b" * 100)):
        raw = text.encode()
        assert bytes(dec[mid]["pixels"])[: len(raw)] == raw
        assert dec[mid]["width"] == 16


def test_png_grayscale_roundtrip_and_rgb_expansion():
    """Grayscale (color type 0) encode→decode: pixels survive all five
    filters and expand to (g,g,g) RGB — one channel contract for every
    color type."""
    w, h = 7, 6  # 6 rows -> filters 0..4 and a repeat
    gray = bytes((i * 37) % 256 for i in range(w * h))
    png = multimodal.encode_png_gray(w, h, gray)
    dw, dh, rgb = multimodal.decode_png(png)
    assert (dw, dh) == (w, h) and len(rgb) == w * h * 3
    assert rgb[0::3] == gray and rgb[1::3] == gray and rgb[2::3] == gray


def test_png_palette_roundtrip():
    """Indexed (color type 3): PLTE lookup reproduces the exact RGB the
    palette defines, across all five scanline filters."""
    w, h = 5, 6
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 17, 34, 51])  # 4 entries
    idx = bytes((i * 3) % 4 for i in range(w * h))
    png = multimodal.encode_png_palette(w, h, idx, palette)
    dw, dh, rgb = multimodal.decode_png(png)
    assert (dw, dh) == (w, h)
    for i, k in enumerate(idx):
        assert rgb[3 * i : 3 * i + 3] == palette[3 * k : 3 * k + 3], i
    # malformed: out-of-range index must raise, not wrap
    with pytest.raises(ValueError, match="index out of range"):
        multimodal.encode_png_palette(w, h, bytes([9]) * (w * h), palette)


def test_png_palette_decode_rejects_missing_plte():
    import struct as _s
    import zlib as _z

    ihdr = _s.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    raw = _z.compress(b"\x00\x00\x00")  # filter byte + 2 indices
    body = b""
    for tag, data in ((b"IHDR", ihdr), (b"IDAT", raw), (b"IEND", b"")):
        body += (
            _s.pack(">I", len(data)) + tag + data
            + _s.pack(">I", _z.crc32(tag + data) & 0xFFFFFFFF)
        )
    with pytest.raises(ValueError, match="PLTE"):
        multimodal.decode_png(multimodal.PNG_SIG + body)


def test_verified_features_consistent_with_float_features(spark):
    """The integer-exact verified features must agree with the float
    feature vector: channel means == sums / n_px (up to the float path's
    6dp rounding), geometry identical — on BMP and PNG payloads."""
    df = spark.createDataFrame(
        [(1, "hello multimodal world"), (2, ""), (3, "x" * 100)],
        "doc_id long, text string",
    )
    for maker in (
        multimodal.media_bmp_from_documents,
        multimodal.media_png_from_documents,
    ):
        media = maker(df)
        ints = {
            r["media_id"]: r
            for r in multimodal.extract_features_verified(media).collect()
        }
        floats = {
            r["media_id"]: r["feature"]
            for r in multimodal.extract_features(media, dim=8).collect()
        }
        for mid, iv in ints.items():
            fv = floats[mid]
            assert (iv["width"], iv["height"]) == (int(fv[0]), int(fv[1]))
            assert iv["n_px"] == iv["width"] * iv["height"]
            for k, col in ((2, "b_sum"), (3, "g_sum"), (4, "r_sum")):
                assert abs(fv[k] - iv[col] / iv["n_px"]) < 1e-6, (mid, col)
            assert 0 <= iv["nonzero_px"] <= iv["n_px"]


def _rgb(w, h, seed=0):
    return bytes((i * 37 + seed * 11) % 256 for i in range(w * h * 3))


def test_png_rgba_roundtrip_strips_alpha():
    w, h = 7, 5
    rgb = _rgb(w, h)
    rgba = bytearray()
    for i in range(w * h):
        rgba += rgb[3 * i : 3 * i + 3] + bytes([(i * 53) % 256])
    got = multimodal.decode_png(multimodal.encode_png_rgba(w, h, bytes(rgba)))
    assert got == (w, h, rgb)


def test_png_gray_alpha_roundtrip():
    w, h = 6, 4
    gray = bytes((i * 29) % 256 for i in range(w * h))
    ga = bytearray()
    for i, g in enumerate(gray):
        ga += bytes([g, (255 - g) % 256])
    got_w, got_h, body = multimodal.decode_png(
        multimodal.encode_png_gray_alpha(w, h, bytes(ga))
    )
    assert (got_w, got_h) == (w, h)
    assert body[0::3] == gray and body[1::3] == gray and body[2::3] == gray


def test_png_16bit_roundtrip():
    w, h = 5, 3
    rgb = _rgb(w, h, seed=3)
    got = multimodal.decode_png(multimodal.encode_png16(w, h, rgb))
    assert got == (w, h, rgb)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (8, 8), (9, 9), (16, 5), (2, 13)])
def test_png_adam7_roundtrip_matches_noninterlaced(w, h):
    """Adam7 decode must reproduce the exact pixels of the plain encode,
    across sizes that exercise empty passes (dims < 8) and uneven pass
    grids."""
    rgb = _rgb(w, h, seed=w * 31 + h)
    plain = multimodal.decode_png(multimodal.encode_png(w, h, rgb))
    inter = multimodal.decode_png(multimodal.encode_png(w, h, rgb, interlace=True))
    assert inter == plain == (w, h, rgb)


def test_png_16bit_interlaced_roundtrip():
    w, h = 11, 7
    rgb = _rgb(w, h, seed=9)
    got = multimodal.decode_png(multimodal.encode_png16(w, h, rgb, interlace=True))
    assert got == (w, h, rgb)


def test_png_rgba_interlaced_roundtrip():
    w, h = 10, 9
    rgb = _rgb(w, h, seed=4)
    rgba = bytearray()
    for i in range(w * h):
        rgba += rgb[3 * i : 3 * i + 3] + bytes([i % 256])
    got = multimodal.decode_png(
        multimodal.encode_png_rgba(w, h, bytes(rgba), interlace=True)
    )
    assert got == (w, h, rgb)


def test_png_subbyte_depth_now_decodes():
    # depth-4 grayscale was the last internal PNG gap until this round:
    # a hand-packed 1x1 depth-4 IHDR + one filter-0 scanline must decode
    # (sample 0xF scales to 255)
    import struct as _s
    import zlib as _z

    ihdr = _s.pack(">IIBBBBB", 1, 1, 4, 0, 0, 0, 0)
    payload = (
        multimodal.PNG_SIG
        + multimodal._png_chunk(b"IHDR", ihdr)
        + multimodal._png_chunk(b"IDAT", _z.compress(b"\x00\xf0"))
        + multimodal._png_chunk(b"IEND", b"")
    )
    assert multimodal.decode_png(payload) == (1, 1, b"\xff\xff\xff")


def test_png_property_roundtrip_all_variants():
    """Randomized round-trips across the full supported matrix: sizes
    (incl. Adam7 edge grids), all five filters in play, every encoder.
    Hypothesis-style but with a fixed LCG corpus for determinism."""
    seed = 0x2545F491
    for trial in range(40):
        seed = (seed * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        w = seed % 13 + 1
        h = (seed >> 8) % 13 + 1
        inter = bool((seed >> 16) & 1)
        rgb = bytes((seed >> (8 * (i % 6))) % 256 for i in range(w * h * 3))
        assert multimodal.decode_png(
            multimodal.encode_png(w, h, rgb, interlace=inter)
        ) == (w, h, rgb), (w, h, inter, "rgb8")
        assert multimodal.decode_png(
            multimodal.encode_png16(w, h, rgb, interlace=inter)
        ) == (w, h, rgb), (w, h, inter, "rgb16")
        rgba = bytearray()
        for i in range(w * h):
            rgba += rgb[3 * i : 3 * i + 3] + bytes([(seed >> 24) % 256])
        assert multimodal.decode_png(
            multimodal.encode_png_rgba(w, h, bytes(rgba), interlace=inter)
        ) == (w, h, rgb), (w, h, inter, "rgba")


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("w,h", [(1, 1), (7, 6), (13, 5), (16, 9)])
def test_png_subbyte_gray_roundtrip(depth, w, h):
    """Sub-byte grayscale (1/2/4-bit): widths chosen so rows end with pad
    bits (7 and 13 are never multiples of 8/depth); decode scales samples
    by the spec factor (255, 85, 17) and expands gray->RGB."""
    mx = (1 << depth) - 1
    samples = bytes((i * 7 + w) % (mx + 1) for i in range(w * h))
    scale = 255 // mx
    for interlace in (False, True):
        got_w, got_h, body = multimodal.decode_png(
            multimodal.encode_png_subbyte(w, h, samples, depth, interlace=interlace)
        )
        assert (got_w, got_h) == (w, h)
        want = bytes(s * scale for s in samples)
        assert body[0::3] == want and body[1::3] == want and body[2::3] == want


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_indexed_roundtrip(depth):
    w, h = 11, 7
    n_colors = 1 << depth
    palette = bytes((i * 13 + c * 51) % 256 for i in range(n_colors) for c in range(3))
    samples = bytes((i * 5) % n_colors for i in range(w * h))
    for interlace in (False, True):
        got_w, got_h, body = multimodal.decode_png(
            multimodal.encode_png_subbyte(
                w, h, samples, depth, palette=palette, interlace=interlace
            )
        )
        assert (got_w, got_h) == (w, h)
        want = b"".join(palette[3 * s : 3 * s + 3] for s in samples)
        assert body == want


def test_png_subbyte_validation():
    with pytest.raises(ValueError, match="out of range"):
        multimodal.encode_png_subbyte(2, 1, bytes([0, 2]), 1)
    with pytest.raises(ValueError, match="depth"):
        multimodal.encode_png_subbyte(2, 1, bytes([0, 1]), 3)
    # depth-16 indexed is illegal per spec and must be rejected
    import struct as _s
    import zlib as _z

    ihdr = _s.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    chunk = (
        _s.pack(">I", len(ihdr))
        + b"IHDR" + ihdr
        + _s.pack(">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(NotImplementedError):
        multimodal.decode_png(multimodal.PNG_SIG + chunk)


# ---------------------------------------------------------------------------
# resize_media (nearest-neighbor)
# ---------------------------------------------------------------------------


def test_resize_nearest_py_identity_and_downsample():
    # 2x2 image, distinct pixels
    px = bytes(range(12))
    assert multimodal.resize_nearest_py(2, 2, px, 2, 2) == px
    # 1x1 target picks the top-left source pixel
    assert multimodal.resize_nearest_py(2, 2, px, 1, 1) == px[0:3]
    # upsample 1x1 -> 2x2 replicates the pixel
    one = bytes([9, 8, 7])
    assert multimodal.resize_nearest_py(1, 1, one, 2, 2) == one * 4
    import pytest as _pt

    with _pt.raises(ValueError):
        multimodal.resize_nearest_py(2, 2, px, 0, 1)


def test_resize_media_roundtrip_and_reference(spark):
    rows = [(1, "hello world, this is a longer doc " * 4), (2, "tiny"), (3, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = multimodal.media_bmp_from_documents(docs)
    out = {
        r.media_id: r
        for r in multimodal.resize_media(media, out_w=8, out_h=6).collect()
    }
    for doc_id, text in rows:
        r = out[doc_id]
        # python mirror straight from the construction contract
        data = text.encode()
        sh = max(-(-len(data) // 48), 1)
        src = data + b"\x00" * (48 * sh - len(data))
        want = multimodal.resize_nearest_py(16, sh, src, 8, 6)
        assert r.pixel_hex == want.hex().upper()
        assert (r.src_width, r.src_height, r.width, r.height) == (16, sh, 8, 6)
        # the re-encoded BMP payload decodes back to the same bytes
        w2, h2, px2 = multimodal.decode_bmp(bytes(r.payload))
        assert (w2, h2, px2) == (8, 6, want)


# ---------------------------------------------------------------------------
# aHash perceptual fingerprint
# ---------------------------------------------------------------------------


def _py_ahash(text, grid=8, width=16):
    raw = text.encode("utf-8")
    h = max(-(-len(raw) // (width * 3)), 1)
    body = raw + b"\x00" * (width * 3 * h - len(raw))
    lums = []
    for k in range(grid * grid):
        y, x = k // grid, k % grid
        sy, sx = (y * h) // grid, (x * width) // grid
        off = sy * width * 3 + 3 * sx
        b, g, r = body[off], body[off + 1], body[off + 2]
        lums.append(114 * b + 587 * g + 299 * r)
    mean = sum(lums) // (grid * grid)
    return "".join("1" if v > mean else "0" for v in lums)


def test_image_ahash_matches_python_reference(spark):
    texts = ["hello world " * 20, "", "x", "\x7f" * 100, "aAbBcC " * 40]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    media = multimodal.media_bmp_from_documents(docs)
    got = {r.media_id: (r.width, r.height, r.ahash)
           for r in multimodal.image_ahash(media, grid=8).collect()}
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        hh = max(-(-len(raw) // 48), 1)
        assert got[i] == (16, hh, _py_ahash(t)), i
    # constant image (empty text -> all-zero pixels): no cell beats the
    # mean, hash all zeros
    assert got[1][2] == "0" * 64


def test_image_ahash_identical_images_collide(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "different content here")],
        "doc_id bigint, text string",
    )
    media = multimodal.media_bmp_from_documents(docs)
    rows = multimodal.image_ahash(media).collect()
    hs = {r.media_id: r.ahash for r in rows}
    assert hs[1] == hs[2]
    assert len(rows[0].ahash) == 64
    import pytest

    with pytest.raises(ValueError):
        multimodal.image_ahash(media, grid=0)
