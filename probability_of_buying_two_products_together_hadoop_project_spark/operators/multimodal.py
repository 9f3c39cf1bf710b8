"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Decode is REAL for 24-bit uncompressed BMP — a pure-Python parser below
(BMP needs no codec library: fixed 54-byte header + padded BGR rows) —
for the complete PNG spec (stdlib zlib), and for 16-bit PCM RIFF/WAVE
audio (``decode_wav``: a true chunk walk, no codec library needed).
Formats that genuinely need codec libraries not present in this container
(JPEG/compressed audio/video) remain stubbed behind ``decode_image``'s
``NotImplementedError`` branch, with a deterministic byte-histogram fake
as the stand-in so the pipeline shape stays testable.

The Spark-side plumbing is real and tested either way: binary schema,
typed metadata struct, Arrow-batched ``mapInPandas`` with explicit output
schema, and batch-shape handling.

Scale notes: binary payloads stay in-executor (never collected);
``mapInPandas`` streams Arrow record batches, so peak memory is one batch
of payloads, controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Fake media table: document text bytes as an opaque payload with
    typed metadata — the schema/partitioning shape of a real media table."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).alias("meta"),
    )


# --- BMP codec (pure Python; 24-bit uncompressed, BITMAPINFOHEADER) -----


def encode_bmp(width: int, height: int, pixel_bytes: bytes) -> bytes:
    """Pack BGR pixel bytes (len == width*height*3, row 0 = TOP row) into
    a 24-bit uncompressed BMP. Rows are written bottom-up with 4-byte
    alignment padding, per the format."""
    if len(pixel_bytes) != width * height * 3:
        raise ValueError("pixel_bytes must be width*height*3 BGR bytes")
    row_len = width * 3
    pad = (-row_len) % 4
    body = b"".join(
        pixel_bytes[r * row_len : (r + 1) * row_len] + b"\x00" * pad
        for r in range(height - 1, -1, -1)
    )
    file_size = 54 + len(body)
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", file_size, 0, 0, 54,       # BITMAPFILEHEADER
        40, width, height, 1, 24,          # BITMAPINFOHEADER: size, w, h, planes, bpp
        0, len(body), 2835, 2835, 0, 0,    # BI_RGB, image size, 72 DPI, no palette
    )
    return header + body


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a 24-bit uncompressed BMP -> (width, height, BGR bytes with
    row 0 = TOP row, padding stripped). Validates magic, bpp, compression."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height, _planes, bpp = struct.unpack_from("<IiiHH", payload, 14)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP supported")
    top_down = height < 0
    height = abs(height)
    row_len = width * 3
    stride = row_len + ((-row_len) % 4)
    rows = []
    for r in range(height):
        src = r if top_down else height - 1 - r
        start = data_offset + src * stride
        rows.append(payload[start : start + row_len])
    body = b"".join(rows)
    if len(body) != width * height * 3:
        raise ValueError("truncated BMP pixel data")
    return width, height, body


# --- PNG codec (pure Python + stdlib zlib; 8-bit RGB, non-interlaced) ---

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png_filter_line(
    ftype: int, line: bytes, prev: bytes, bpp: int = 3
) -> bytearray:
    """Apply PNG forward filter ``ftype`` to one scanline (spec §9)."""
    n = len(line)
    res = bytearray(n)
    for i in range(n):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        res[i] = (line[i] - pred) & 0xFF
    return res


def _png_unfilter(
    raw: bytes, width: int, height: int, bpp: int = 3, stride: int | None = None
) -> bytes:
    """Reverse the per-scanline filters of decompressed IDAT data.
    ``stride`` overrides the scanline byte length for sub-byte depths
    (packed rows, filter unit = 1 byte per spec §9)."""
    stride = width * bpp if stride is None else stride
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out += line
        prev = line
    return bytes(out)


def _png_filtered_scanlines(
    width: int, height: int, body: bytes, bpp: int, filter_mode: str
) -> bytes:
    """Filter a flat pixel body into PNG scanline bytes (mixed cycles
    all five spec filter types; 'none' writes filter 0 throughout)."""
    stride = width * bpp
    lines = []
    prev = bytes(stride)
    for r in range(height):
        line = body[r * stride : (r + 1) * stride]
        ftype = (r % 5) if filter_mode == "mixed" else 0
        lines.append(
            bytes([ftype]) + bytes(_png_filter_line(ftype, line, prev, bpp=bpp))
        )
        prev = line
    return b"".join(lines)


def _png_interlaced_scanlines(
    width: int, height: int, body: bytes, bpp: int, filter_mode: str
) -> bytes:
    """Split the flat body into the seven Adam7 passes and filter each
    pass as its own sub-image (each pass restarts prev = zeros, per
    spec §8.2)."""
    parts = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        sub = bytearray()
        for j in range(ph):
            yy = y0 + j * dy
            for i in range(pw):
                xx = x0 + i * dx
                src = (yy * width + xx) * bpp
                sub += body[src : src + bpp]
        parts.append(_png_filtered_scanlines(pw, ph, bytes(sub), bpp, filter_mode))
    return b"".join(parts)


def _png_pack(
    width: int,
    height: int,
    body: bytes,
    ctype: int,
    depth: int,
    bpp: int,
    filter_mode: str,
    interlace: bool,
    plte: bytes | None = None,
) -> bytes:
    scan = (_png_interlaced_scanlines if interlace else _png_filtered_scanlines)(
        width, height, body, bpp, filter_mode
    )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, ctype, 0, 0, 1 if interlace else 0
    )
    chunks = PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        chunks += _png_chunk(b"PLTE", plte)
    return (
        chunks
        + _png_chunk(b"IDAT", zlib.compress(scan, 9))
        + _png_chunk(b"IEND", b"")
    )


def encode_png(
    width: int,
    height: int,
    rgb_bytes: bytes,
    filter_mode: str = "mixed",
    interlace: bool = False,
) -> bytes:
    """Pack RGB pixel bytes (len == width*height*3, row 0 = TOP row) into
    an 8-bit truecolor PNG using only stdlib ``zlib``.

    ``filter_mode='mixed'`` cycles scanlines through all five spec filter
    types (None/Sub/Up/Average/Paeth) — deterministic, and it makes the
    encode→decode round-trip exercise every unfilter branch; ``'none'``
    writes filter 0 throughout. ``interlace=True`` writes Adam7 passes
    (each pass filtered as its own sub-image)."""
    if len(rgb_bytes) != width * height * 3:
        raise ValueError("rgb_bytes must be width*height*3 RGB bytes")
    return _png_pack(width, height, rgb_bytes, 2, 8, 3, filter_mode, interlace)


def encode_png_rgba(
    width: int, height: int, rgba_bytes: bytes, interlace: bool = False
) -> bytes:
    """Pack RGBA pixel bytes (len == width*height*4) into an 8-bit
    truecolor-with-alpha PNG (color type 6), mixed scanline filters."""
    if len(rgba_bytes) != width * height * 4:
        raise ValueError("rgba_bytes must be width*height*4 RGBA bytes")
    return _png_pack(width, height, rgba_bytes, 6, 8, 4, "mixed", interlace)


def encode_png_gray_alpha(width: int, height: int, ga_bytes: bytes) -> bytes:
    """Pack gray+alpha byte pairs (len == width*height*2) into a color
    type 4 PNG, mixed scanline filters."""
    if len(ga_bytes) != width * height * 2:
        raise ValueError("ga_bytes must be width*height*2 gray+alpha bytes")
    return _png_pack(width, height, ga_bytes, 4, 8, 2, "mixed", False)


def encode_png16(
    width: int, height: int, rgb_bytes: bytes, interlace: bool = False
) -> bytes:
    """Pack 8-bit RGB pixel bytes into a 16-BIT truecolor PNG: each
    sample s widens to the big-endian 16-bit value s*257 = (s<<8)|s (the
    spec's exact 8->16 scaling), so the decoder's MSB extraction
    round-trips bit-exactly."""
    if len(rgb_bytes) != width * height * 3:
        raise ValueError("rgb_bytes must be width*height*3 RGB bytes")
    wide = bytearray(len(rgb_bytes) * 2)
    wide[0::2] = rgb_bytes
    wide[1::2] = rgb_bytes
    return _png_pack(width, height, bytes(wide), 2, 16, 6, "mixed", interlace)


def encode_png_gray(width: int, height: int, gray_bytes: bytes) -> bytes:
    """Pack 8-bit grayscale bytes (len == width*height, row 0 = TOP) into
    a non-interlaced grayscale PNG (color type 0), mixed scanline
    filters as in :func:`encode_png`."""
    if len(gray_bytes) != width * height:
        raise ValueError("gray_bytes must be width*height bytes")
    lines = []
    prev = bytes(width)
    for r in range(height):
        line = gray_bytes[r * width : (r + 1) * width]
        ftype = r % 5
        lines.append(
            bytes([ftype]) + bytes(_png_filter_line(ftype, line, prev, bpp=1))
        )
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines), 9))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(
    width: int, height: int, indices: bytes, palette: bytes
) -> bytes:
    """Pack 8-bit palette indices + an RGB palette (<=256*3 bytes, len a
    multiple of 3) into an indexed-color PNG (color type 3), mixed
    scanline filters."""
    if len(indices) != width * height:
        raise ValueError("indices must be width*height bytes")
    if len(palette) % 3 != 0 or not 3 <= len(palette) <= 256 * 3:
        raise ValueError("palette must be 1..256 RGB triples")
    if max(indices, default=0) >= len(palette) // 3:
        raise ValueError("palette index out of range")
    lines = []
    prev = bytes(width)
    for r in range(height):
        line = indices[r * width : (r + 1) * width]
        ftype = r % 5
        lines.append(
            bytes([ftype]) + bytes(_png_filter_line(ftype, line, prev, bpp=1))
        )
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines), 9))
        + _png_chunk(b"IEND", b"")
    )


def _pack_bits(samples: bytes, width: int, depth: int) -> bytes:
    """Pack one row of sub-byte samples (one byte per sample, each <
    2**depth) into MSB-first PNG packed bytes (spec §7.2)."""
    per = 8 // depth
    out = bytearray((width * depth + 7) // 8)
    mask = (1 << depth) - 1
    for i in range(width):
        shift = 8 - depth * ((i % per) + 1)
        out[i // per] |= (samples[i] & mask) << shift
    return bytes(out)


def _unpack_bits(row: bytes, width: int, depth: int) -> bytes:
    """Inverse of :func:`_pack_bits`: MSB-first packed bytes -> one byte
    per sample (trailing pad bits of the last byte are ignored)."""
    per = 8 // depth
    mask = (1 << depth) - 1
    out = bytearray(width)
    for i in range(width):
        out[i] = (row[i // per] >> (8 - depth * ((i % per) + 1))) & mask
    return bytes(out)


def encode_png_subbyte(
    width: int,
    height: int,
    samples: bytes,
    depth: int,
    palette: bytes | None = None,
    interlace: bool = False,
) -> bytes:
    """Pack sub-byte-depth samples (1/2/4 bits; one byte per sample in
    ``samples``, row 0 = TOP) into a grayscale PNG, or an indexed-color
    PNG when ``palette`` (RGB triples) is given — the only two color
    types the spec allows below 8 bits. Scanlines pack MSB-first; the
    filter unit for sub-byte depths is ONE BYTE of packed data (spec
    §9: bpp rounds up to 1), and the mixed filter cycle exercises every
    filter over packed bytes."""
    if depth not in (1, 2, 4):
        raise ValueError("sub-byte PNG depth must be 1, 2, or 4")
    if len(samples) != width * height:
        raise ValueError("samples must be width*height bytes (one per pixel)")
    if max(samples, default=0) >= (1 << depth):
        raise ValueError(f"sample out of range for depth {depth}")
    if palette is not None:
        if len(palette) % 3 != 0 or not 3 <= len(palette) <= (1 << depth) * 3:
            raise ValueError("palette must be 1..2**depth RGB triples")
        if max(samples, default=0) >= len(palette) // 3:
            raise ValueError("palette index out of range")
    def pass_lines(pw: int, ph: int, psamples: bytes) -> list[bytes]:
        stride = (pw * depth + 7) // 8
        prev = bytes(stride)
        out = []
        for r in range(ph):
            line = _pack_bits(psamples[r * pw : (r + 1) * pw], pw, depth)
            ftype = r % 5
            out.append(
                bytes([ftype]) + bytes(_png_filter_line(ftype, line, prev, bpp=1))
            )
            prev = line
        return out

    lines: list[bytes] = []
    if not interlace:
        lines = pass_lines(width, height, samples)
    else:
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub = bytearray()
            for j in range(ph):
                for i in range(pw):
                    sub.append(samples[(y0 + j * dy) * width + (x0 + i * dx)])
            lines += pass_lines(pw, ph, bytes(sub))
    ctype = 0 if palette is None else 3
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, ctype, 0, 0, 1 if interlace else 0
    )
    chunks = PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        chunks += _png_chunk(b"PLTE", palette)
    return (
        chunks
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines), 9))
        + _png_chunk(b"IEND", b"")
    )


# Adam7 interlacing pass grid (spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a PNG -> (width, height, RGB bytes with row 0 = TOP row):
    IHDR/PLTE/IDAT walk, zlib inflate, unfilter, deinterlace.

    REAL for every color type (0 gray, 2 truecolor, 3 indexed, 4
    gray+alpha, 6 RGBA), EVERY legal bit depth (1/2/4 packed MSB-first
    for gray/indexed with spec sample scaling x255/x85/x17; 8; 16 where
    samples take the most-significant byte — exact for the x*257
    encoding convention), and BOTH interlace methods (none + Adam7:
    each pass is an independently filtered sub-image, reassembled by
    the pass grid). Alpha is STRIPPED, not composited, so every color
    type honors the same 3-channel contract. Chunk CRCs are not
    re-verified (zlib's adler32 already covers the pixel stream). The
    PNG static-image spec surface is now complete; JPEG remains the one
    honest external-codec stub."""
    if payload is None or not payload.startswith(PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    palette = None
    width = height = ctype = depth = interlace = None
    while pos + 8 <= len(payload):
        ln, tag = struct.unpack_from(">I4s", payload, pos)
        pos += 8
        data = payload[pos : pos + ln]
        pos += ln + 4  # skip CRC
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            ok_depth = depth in (8, 16) or (
                depth in (1, 2, 4) and ctype in (0, 3)
            )
            if (
                ctype not in _PNG_CHANNELS
                or not ok_depth
                or (ctype == 3 and depth == 16)
                or comp != 0
                or filt != 0
                or interlace not in (0, 1)
            ):
                raise NotImplementedError(
                    "unsupported PNG variant: nonstandard compression/"
                    "filter method or illegal depth/color-type combination"
                )
        elif tag == b"PLTE":
            palette = data
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    if depth in (1, 2, 4):
        # sub-byte gray/indexed: unfilter packed rows (filter unit is one
        # byte), then bit-unpack MSB-first to one sample per pixel
        px = _png_subbyte_samples(raw, width, height, depth, interlace)
        if ctype == 0:
            # spec sample scaling to 8 bits: 1->x255, 2->x85, 4->x17
            scale = 255 // ((1 << depth) - 1)
            px = bytes(v * scale for v in px)
            out = bytearray(len(px) * 3)
            out[0::3] = px
            out[1::3] = px
            out[2::3] = px
            return width, height, bytes(out)
        return _png_palette_expand(width, height, px, palette)
    bpp = channels * (depth // 8)
    if interlace == 0:
        flat = _png_unfilter(raw, width, height, bpp=bpp)
    else:
        buf = bytearray(width * height * bpp)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub_len = ph * (1 + pw * bpp)
            sub = _png_unfilter(raw[off : off + sub_len], pw, ph, bpp=bpp)
            off += sub_len
            for j in range(ph):
                for i in range(pw):
                    src = (j * pw + i) * bpp
                    dst = ((y0 + j * dy) * width + (x0 + i * dx)) * bpp
                    buf[dst : dst + bpp] = sub[src : src + bpp]
        if off != len(raw):
            raise ValueError("interlaced PNG scanline data has wrong length")
        flat = bytes(buf)
    if depth == 16:
        # big-endian samples: byte 0 of each pair is the MSB
        flat = flat[0::2]
    n_px = width * height
    if ctype == 2:
        return width, height, bytes(flat)
    if ctype == 6:
        out = bytearray(n_px * 3)
        out[0::3] = flat[0::4]
        out[1::3] = flat[1::4]
        out[2::3] = flat[2::4]
        return width, height, bytes(out)
    if ctype == 4:
        px = flat[0::2]
    else:
        px = flat
    if ctype in (0, 4):
        # gray -> RGB expansion (g,g,g): callers get one channel
        # contract for every color type
        out = bytearray(len(px) * 3)
        out[0::3] = px
        out[1::3] = px
        out[2::3] = px
        return width, height, bytes(out)
    return _png_palette_expand(width, height, px, palette)


def _png_palette_expand(
    width: int, height: int, px: bytes, palette: bytes | None
) -> tuple[int, int, bytes]:
    """Indexed-color tail shared by the 8-bit and sub-byte paths: map
    palette indices to RGB triples."""
    if palette is None or len(palette) % 3 != 0 or not palette:
        raise ValueError("indexed PNG missing or malformed PLTE")
    n_entries = len(palette) // 3
    if max(px, default=0) >= n_entries:
        raise ValueError("palette index out of range")
    out = bytearray(len(px) * 3)
    for i, idx in enumerate(px):
        out[3 * i : 3 * i + 3] = palette[3 * idx : 3 * idx + 3]
    return width, height, bytes(out)


def _png_subbyte_samples(
    raw: bytes, width: int, height: int, depth: int, interlace: int
) -> bytes:
    """Unfilter + bit-unpack sub-byte scanline data -> one byte per
    pixel sample, honoring Adam7 pass geometry when interlaced (each
    pass packs its own rows, so pad bits fall at pass-row ends)."""
    stride = (width * depth + 7) // 8
    if interlace == 0:
        packed = _png_unfilter(raw, width, height, bpp=1, stride=stride)
        out = bytearray()
        for r in range(height):
            out += _unpack_bits(packed[r * stride : (r + 1) * stride], width, depth)
        return bytes(out)
    buf = bytearray(width * height)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        ps = (pw * depth + 7) // 8
        sub_len = ph * (1 + ps)
        sub = _png_unfilter(raw[off : off + sub_len], pw, ph, bpp=1, stride=ps)
        off += sub_len
        for j in range(ph):
            rowsamp = _unpack_bits(sub[j * ps : (j + 1) * ps], pw, depth)
            for i in range(pw):
                buf[(y0 + j * dy) * width + (x0 + i * dx)] = rowsamp[i]
    if off != len(raw):
        raise ValueError("interlaced PNG scanline data has wrong length")
    return bytes(buf)


def png_from_text(text: str, width: int = 16) -> bytes:
    """Deterministic synthetic image: utf-8 bytes of the text, zero-padded
    to whole pixel rows, as 8-bit RGB PNG (mixed scanline filters)."""
    raw = (text or "").encode("utf-8")
    row_bytes = width * 3
    height = max((len(raw) + row_bytes - 1) // row_bytes, 1)
    raw = raw.ljust(width * height * 3, b"\x00")
    return encode_png(width, height, raw)


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an image payload -> (width, height, BGR bytes, top-down).

    REAL for 24-bit uncompressed BMP and 8-bit truecolor PNG (pure-Python
    parsers above; PNG needs only stdlib zlib). PNG's native RGB is
    swapped to BGR so both formats honor the same channel contract.
    JPEG genuinely needs a codec library absent from this container and
    raises — plug a real decoder into that branch.

    DECISION (r09, final): the JPEG branch STAYS a loud stub. A
    pure-Python baseline-JPEG decoder (Huffman + dequant + iDCT +
    chroma upsample) would be ~1k lines serving no oracle — DuckDB
    could not replicate it, so it could never earn a hash-matched
    registry row — and every Spark-side contract the stub guards
    (schema, Arrow batch shape, partitioning, error surface) is
    already exercised by the BMP/PNG/WAV REAL codecs. In a deployment
    the branch takes `pillow`/`libjpeg` in one line; the media
    synthesis matrix keeps JPEG out of its formats rather than faking
    pixels."""
    if payload is not None and payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload is not None and payload.startswith(PNG_SIG):
        w, h, rgb = decode_png(payload)
        bgr = bytearray(rgb)
        bgr[0::3], bgr[2::3] = rgb[2::3], rgb[0::3]
        return w, h, bytes(bgr)
    raise NotImplementedError(
        "only BMP and PNG decode without a codec library; plug a JPEG "
        "decoder in here"
    )


def bmp_from_text(text: str, width: int = 16) -> bytes:
    """Deterministic synthetic image: utf-8 bytes of the text, zero-padded
    to a whole number of width×1 pixel rows, as 24-bit BMP. Gives every
    document a REAL decodable image payload derived only from its content."""
    raw = (text or "").encode("utf-8")
    row_bytes = width * 3
    height = max((len(raw) + row_bytes - 1) // row_bytes, 1)
    raw = raw.ljust(width * height * 3, b"\x00")
    return encode_bmp(width, height, raw)


def media_bmp_from_documents(docs: DataFrame, width: int = 16) -> DataFrame:
    """Media table whose payloads are REAL decodable images: each
    document's text rendered as a synthetic 24-bit BMP (``bmp_from_text``).

    Synthesis is an Arrow-batched pandas UDF (binary packing is
    per-payload imperative work, the legitimate Pandas-UDF case); all
    downstream ops are JVM-side over the binary column.
    """

    @F.pandas_udf(T.BinaryType())
    def make_bmp(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: bmp_from_text(t, width))

    payload = make_bmp(F.col("text"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
    ).select(
        "media_id",
        "payload",
        F.struct(
            F.lit("image/bmp").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.lit(width).cast("int").alias("width"),
            # height from the file header, JVM-side: little-endian int32 at
            # byte offset 22 (1-indexed 23..26)
            F.expr(
                "cast(conv(concat(hex(substring(payload, 26, 1)),"
                " hex(substring(payload, 25, 1)),"
                " hex(substring(payload, 24, 1)),"
                " hex(substring(payload, 23, 1))), 16, 10) as int)"
            ).alias("height"),
        ).alias("meta"),
    )


def media_png_from_documents(docs: DataFrame, width: int = 16) -> DataFrame:
    """Media table whose payloads are REAL decodable PNGs: each document's
    text rendered as a synthetic 8-bit RGB PNG (``png_from_text``, mixed
    scanline filters so decode exercises the full spec surface).

    Same shape as ``media_bmp_from_documents``: Arrow-batched pandas UDF
    for the per-payload packing, JVM-side metadata extraction (PNG's
    IHDR height is the big-endian int32 at byte offset 20 → 1-indexed
    21..24)."""

    @F.pandas_udf(T.BinaryType())
    def make_png(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: png_from_text(t, width))

    return docs.select(
        F.col("doc_id").alias("media_id"),
        make_png(F.col("text")).alias("payload"),
    ).select(
        "media_id",
        "payload",
        F.struct(
            F.lit("image/png").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.lit(width).cast("int").alias("width"),
            F.expr(
                "cast(conv(hex(substring(payload, 21, 4)), 16, 10) as int)"
            ).alias("height"),
        ).alias("meta"),
    )


DECODED_PIXELS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("pixels", T.BinaryType(), True),
    ]
)


def decode_png_pixels(media: DataFrame) -> DataFrame:
    """Full pixel-stream PNG decode over the binary column: (media_id,
    width, height, RGB pixel bytes). Arrow-batched ``mapInPandas`` —
    payloads never leave the executors; downstream comparisons (e.g. the
    round-trip oracle's md5) run JVM-side on the decoded bytes."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            decoded = [decode_png(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "pixels": [d[2] for d in decoded],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, DECODED_PIXELS_SCHEMA
    )


def image_features(payload: bytes) -> list[float]:
    """Decoder-derived 8-dim feature for a BMP payload: geometry + per-
    channel means + luma mean/std + nonzero-pixel fraction. Raises for
    non-BMP payloads (see ``decode_image``)."""
    width, height, body = decode_image(payload)
    n_px = width * height
    b_sum = g_sum = r_sum = 0
    luma = []
    nonzero = 0
    for i in range(n_px):
        b, g, r = body[3 * i], body[3 * i + 1], body[3 * i + 2]
        b_sum += b
        g_sum += g
        r_sum += r
        luma.append(0.114 * b + 0.587 * g + 0.299 * r)
        if b or g or r:
            nonzero += 1
    mean_luma = sum(luma) / n_px
    var_luma = sum((x - mean_luma) ** 2 for x in luma) / n_px
    return [
        float(width),
        float(height),
        round(b_sum / n_px, 6),
        round(g_sum / n_px, 6),
        round(r_sum / n_px, 6),
        round(mean_luma, 6),
        round(var_luma**0.5, 6),
        round(nonzero / n_px, 6),
    ]


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoder': fixed-dim feature from byte histogram.
    Stand-in for formats whose decode needs an absent codec library."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = max(len(payload), 1)
    return [round(a / n, 6) for a in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    BMP payloads (magic ``BM``) go through the REAL pure-Python decoder
    (``image_features``: geometry, channel means, luma stats); other
    formats fall back to the deterministic byte-histogram stand-in.
    ``mapInPandas`` so the decoder does per-batch imperative work; the
    output schema is explicit and stable (FEATURE_SCHEMA).
    """

    def feat(p: bytes) -> list[float]:
        if p is not None and (p[:2] == b"BM" or p.startswith(PNG_SIG)):
            f = image_features(p)
            return f[:dim] + [0.0] * (dim - len(f))
        return _fake_feature(p, dim)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": [feat(p) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


VERIFIED_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_px", T.LongType(), True),
        T.StructField("b_sum", T.LongType(), True),
        T.StructField("g_sum", T.LongType(), True),
        T.StructField("r_sum", T.LongType(), True),
        T.StructField("nonzero_px", T.LongType(), True),
    ]
)


def extract_features_verified(media: DataFrame) -> DataFrame:
    """Decoder-derived features restricted to INTEGER-EXACT quantities —
    geometry, per-channel byte sums, nonzero-pixel count — so a SQL
    oracle can recompute every value bit-for-bit from the source bytes
    (integer sums are order-independent; float per-pixel reductions are
    not, which is why ``extract_features``'s luma std has no SQL twin).
    Channel means / luma follow from the sums by one exact double
    division, done OUTSIDE the decoder so both engines share it.

    Same Arrow ``mapInPandas`` shape as ``extract_features``; the numpy
    stride slices verify the decoder's BGR byte ORDER and padding strip,
    not just the header geometry."""
    import numpy as np

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, body = decode_image(bytes(p))
                arr = np.frombuffer(body, dtype=np.uint8)
                px = arr.reshape(-1, 3)
                rows.append(
                    (
                        mid,
                        w,
                        h,
                        w * h,
                        int(arr[0::3].sum()),
                        int(arr[1::3].sum()),
                        int(arr[2::3].sum()),
                        int(px.any(axis=1).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in VERIFIED_FEATURE_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, VERIFIED_FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: slice the payload every N bytes (the
    partitioning/batching shape of video frame extraction), JVM-side."""
    n_frames = F.floor(F.octet_length("payload") / every_n_bytes).cast("int")
    return media.select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                lambda i: F.struct(
                    i.alias("frame_idx"),
                    F.substring(F.col("payload"), i * every_n_bytes + 1, every_n_bytes).alias("frame"),
                ),
            )
        ).alias("fr"),
    ).select("media_id", "fr.frame_idx", F.octet_length("fr.frame").alias("frame_bytes"))


def resize_nearest_py(
    width: int, height: int, px: bytes, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resample of a 3-byte-per-pixel buffer: output
    pixel (y, x) copies source pixel (y*height DIV out_h,
    x*width DIV out_w) — pure integer index arithmetic (floor
    division), so the result is a deterministic byte function of the
    input in any engine or runtime. The standard decimation/upsample
    kernel when interpolation (float blending — order-dependent and
    library-divergent) is explicitly NOT wanted in a verification
    pipeline."""
    if out_w < 1 or out_h < 1:
        raise ValueError(f"target must be >= 1x1, got {out_w}x{out_h}")
    if width < 1 or height < 1:
        raise ValueError(f"source must be >= 1x1, got {width}x{height}")
    out = bytearray(out_w * out_h * 3)
    for y in range(out_h):
        sy = y * height // out_h
        row = sy * width * 3
        o = y * out_w * 3
        for x in range(out_w):
            sx = x * width // out_w
            s = row + sx * 3
            out[o : o + 3] = px[s : s + 3]
            o += 3
    return bytes(out)


def resize_media(media: DataFrame, out_w: int = 8, out_h: int = 6) -> DataFrame:
    """Image RESIZE over the binary media column — the missing quarter
    of the decode / feature-extract / resize / frame-sample quartet:
    decode (BMP or PNG, the real pure-Python codecs), nearest-neighbor
    resample to (out_w, out_h), re-encode as BMP. Arrow-batched
    ``mapInPandas``: payloads never leave the executors, the batch
    shape is the real one a libvips/Pillow kernel would slot into —
    swap ``resize_nearest_py`` for the library call and nothing else
    changes.

    Output: (media_id, src_width, src_height, width, height, payload
    [resized BMP], pixel_hex [uppercase hex of the resized pixel
    buffer — the cross-engine verification column: nearest-neighbor
    indexing is integer floor division, so a SQL oracle regenerates
    these bytes exactly]).
    """
    import pandas as pd  # noqa: PLC0415

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = decode_image(bytes(payload))
                rz = resize_nearest_py(w, h, px, out_w, out_h)
                rows.append(
                    (mid, w, h, out_w, out_h, encode_bmp(out_w, out_h, rz),
                     rz.hex().upper())
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "src_width", "src_height", "width",
                    "height", "payload", "pixel_hex",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run,
        "media_id bigint, src_width int, src_height int, width int, "
        "height int, payload binary, pixel_hex string",
    )


# --- WAV codec (pure Python; RIFF/WAVE, 16-bit PCM little-endian) -------
#
# Audio needs no codec library either: canonical PCM WAV is a 44-byte
# RIFF header plus raw little-endian int16 frames. This gives the audio
# modality the same REAL-codec status as BMP/PNG (reference repo has no
# media handling at all; this is the brief's multimodal extension surface).


def encode_wav(sample_rate: int, channels: int, frame_bytes: bytes) -> bytes:
    """Pack little-endian int16 PCM frames into a canonical RIFF/WAVE
    file (44-byte header: fmt chunk then data chunk). ``frame_bytes``
    length must be a whole number of frames (channels * 2 bytes)."""
    if sample_rate <= 0 or channels <= 0:
        raise ValueError("sample_rate and channels must be positive")
    block_align = channels * 2
    if len(frame_bytes) % block_align:
        raise ValueError("frame_bytes must be a whole number of frames")
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(frame_bytes))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH",
            16, 1, channels, sample_rate,
            sample_rate * block_align, block_align, 16,
        )
        + b"data"
        + struct.pack("<I", len(frame_bytes))
        + frame_bytes
    )


def decode_wav(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a RIFF/WAVE payload -> (sample_rate, channels, little-endian
    int16 frame bytes). A real chunk WALK, not a fixed-offset read: fmt
    and data may be separated by other chunks (LIST/INFO/fact), and RIFF
    pads odd-sized chunks to word boundaries. Validates magic, PCM
    format code, and 16-bit sample width."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF payload")
    if payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WAV chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too small")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
        pos += 8 + size + (size % 2)  # odd chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _brate, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError("only 16-bit PCM WAV supported")
    if channels < 1 or sample_rate < 1:
        raise ValueError("WAV fmt declares zero channels or sample rate")
    if block_align != channels * 2:
        raise ValueError("inconsistent block alignment")
    if len(data) % block_align:
        raise ValueError("truncated WAV frame data")
    return sample_rate, channels, data


def wav_from_text(text: str, sample_rate: int = 8000) -> bytes:
    """Deterministic synthetic audio: each utf-8 byte b of the text
    becomes one mono int16 sample (b - 128) * 256 — full int16 range
    without overflow, zero-mean over uniform bytes. Gives every document
    a REAL decodable audio payload derived only from its content (the
    audio analogue of ``bmp_from_text``)."""
    raw = (text or "").encode("utf-8")
    frames = b"".join(struct.pack("<h", (b - 128) * 256) for b in raw)
    return encode_wav(sample_rate, 1, frames)


def media_wav_from_documents(docs: DataFrame, sample_rate: int = 8000) -> DataFrame:
    """Media table whose payloads are REAL decodable WAV files
    (``wav_from_text``). Same shape as the image synthesizers:
    Arrow-batched pandas UDF packs the bytes, metadata is extracted
    JVM-side from the canonical header (sample rate = little-endian
    int32 at byte offset 24 -> 1-indexed 25..28; channels = the int16
    at offset 22 -> 23..24)."""

    @F.pandas_udf(T.BinaryType())
    def make_wav(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: wav_from_text(t, sample_rate))

    return docs.select(
        F.col("doc_id").alias("media_id"),
        make_wav(F.col("text")).alias("payload"),
    ).select(
        "media_id",
        "payload",
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.expr(
                "cast(conv(concat(hex(substring(payload, 28, 1)),"
                " hex(substring(payload, 27, 1)),"
                " hex(substring(payload, 26, 1)),"
                " hex(substring(payload, 25, 1))), 16, 10) as int)"
            ).alias("sample_rate"),
            F.expr(
                "cast(conv(concat(hex(substring(payload, 24, 1)),"
                " hex(substring(payload, 23, 1))), 16, 10) as int)"
            ).alias("channels"),
        ).alias("meta"),
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("s_sum", T.LongType(), True),
        T.StructField("sq_sum", T.LongType(), True),
        T.StructField("peak_abs", T.IntegerType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
    ]
)


def audio_features_verified(media: DataFrame) -> DataFrame:
    """Decoder-derived audio features restricted to INTEGER-EXACT
    quantities — sample count, sample sum, sum of squares, peak
    amplitude, strict zero crossings (adjacent product < 0) — so a SQL
    oracle can recompute every value bit-for-bit from the source bytes
    (the ``extract_features_verified`` rule: integer sums are
    order-independent, float accumulations are not). RMS/energy follow
    from sq_sum by one exact double expression OUTSIDE the decoder so
    both engines share it. Arrow-batched ``mapInPandas``; numpy views
    verify the decoder's little-endian int16 framing, not just the
    header fields."""
    import numpy as np

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                rate, channels, frames = decode_wav(bytes(p))
                s = np.frombuffer(frames, dtype="<i2").astype(np.int64)
                zc = int(((s[:-1] * s[1:]) < 0).sum()) if s.size > 1 else 0
                rows.append(
                    (
                        mid,
                        rate,
                        channels,
                        int(s.size),
                        int(s.sum()),
                        int((s * s).sum()),
                        int(np.abs(s).max()) if s.size else 0,
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, AUDIO_FEATURE_SCHEMA
    )


def resample_decimate(media: DataFrame, factor: int) -> DataFrame:
    """Integer-decimation resample: keep every ``factor``-th frame (frame
    indices 0, factor, 2*factor, ...) and re-encode at rate/factor —
    the one resampling kernel that is BYTE-EXACT (no filter arithmetic),
    so the whole decode -> decimate -> encode -> re-decode chain is
    verifiable cross-engine. Emits the re-DECODED samples of the newly
    encoded payload (round-trip inside the operator), as int32 values
    for the JVM-side hash column."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    import numpy as np

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                rate, channels, frames = decode_wav(bytes(p))
                fr = np.frombuffer(frames, dtype="<i2").reshape(-1, channels)
                out = np.ascontiguousarray(fr[::factor])
                payload = encode_wav(rate // factor, channels, out.tobytes())
                rate2, ch2, frames2 = decode_wav(payload)
                s2 = np.frombuffer(frames2, dtype="<i2").astype(np.int32)
                rows.append((mid, rate2, ch2, len(frames2) // (ch2 * 2),
                             payload, list(s2)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "channels",
                         "n_frames", "payload", "samples"],
            )

    return media.select("media_id", "payload").mapInPandas(
        run,
        "media_id bigint, sample_rate int, channels int, n_frames bigint, "
        "payload binary, samples array<int>",
    )


def resample_fir(
    media: DataFrame, factor: int, taps: tuple[int, ...] = (1, 2, 1)
) -> DataFrame:
    """Anti-aliased integer-coefficient FIR resample — the decimation
    kernel generalized with a real low-pass: output frame ``m`` is the
    tap-weighted window ``trunc(sum_k taps[k] * x[m*factor + k] /
    sum(taps))`` (zero-padded past the end), so the decimated signal is
    smoothed instead of aliased. The default triangular taps (1, 2, 1)
    are the classic linear-interpolation kernel.

    Determinism contract: ALL-INTEGER arithmetic — int64 tap products,
    one truncate-toward-zero division by the tap sum (matching DuckDB
    ``//`` and Spark ``div``; Python's floor ``//`` differs on negatives,
    so the implementation sign-splits) — every output sample is exactly
    reproducible by a SQL oracle from the source bytes. A convex integer
    combination of int16 samples stays in int16 range, so re-encoding
    needs no clipping. Like :func:`resample_decimate`, the operator
    re-encodes at ``rate // factor`` and re-DECODES its own payload, so
    the emitted samples round-trip the codec.

    Scale: Arrow-batched ``mapInPandas``; per-row work is a strided
    numpy gather — no shuffle, no driver traffic.
    """
    if factor < 1:
        raise ValueError("factor must be >= 1")
    if not taps or any(t < 0 for t in taps) or sum(taps) < 1:
        raise ValueError("taps must be non-empty, non-negative, sum >= 1")
    import numpy as np

    tap_arr = np.asarray(taps, dtype=np.int64)
    den = int(tap_arr.sum())

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                rate, channels, frames = decode_wav(bytes(p))
                fr = np.frombuffer(frames, dtype="<i2").reshape(-1, channels)
                n = fr.shape[0]
                n_out = (n + factor - 1) // factor
                # zero-pad so every tap window is addressable
                pad = np.zeros((len(taps), channels), dtype=np.int64)
                xp = np.concatenate([fr.astype(np.int64), pad])
                acc = np.zeros((n_out, channels), dtype=np.int64)
                idx = np.arange(n_out) * factor
                for k, t in enumerate(taps):
                    acc += t * xp[idx + k]
                # truncate toward zero (DuckDB // and Spark div semantics)
                out = (np.sign(acc) * (np.abs(acc) // den)).astype(np.int16)
                payload = encode_wav(rate // factor, channels, out.tobytes())
                rate2, ch2, frames2 = decode_wav(payload)
                s2 = np.frombuffer(frames2, dtype="<i2").astype(np.int32)
                rows.append((mid, rate2, ch2, len(frames2) // (ch2 * 2),
                             payload, list(s2)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "channels",
                         "n_frames", "payload", "samples"],
            )

    return media.select("media_id", "payload").mapInPandas(
        run,
        "media_id bigint, sample_rate int, channels int, n_frames bigint, "
        "payload binary, samples array<int>",
    )


def image_ahash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Average-hash (aHash) perceptual image fingerprint — the standard
    cheap near-dup detector for image corpora (pHash's little sibling):
    nearest-neighbor downsample to ``grid``×``grid``, integer BT.601
    luma per cell (299r + 587g + 114b in 1e-3 units — EXACT integers,
    no float), cell brighter than the mean (trunc division by grid²) →
    bit 1. Identical-looking images collide; the hamming distance
    between hashes tracks visual difference.

    The hash is emitted as the grid²-char bit STRING: an engine-portable
    grouping key (a 64-bit int would overflow signed at bit 63), and
    every bit is reproducible by a SQL oracle from the source bytes —
    the BMP body is the zero-padded utf-8 text, so cell (y, x) reads
    byte offset ((y*H)//g)*48 + 3*((x*W)//g) (the
    multimodal_features_verified addressing).

    Arrow-batched ``mapInPandas``; map-only, zero exchanges.
    """
    if grid < 1:
        raise ValueError("grid must be >= 1")
    import numpy as np

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, body = decode_bmp(bytes(p))
                px = (
                    np.frombuffer(body, dtype=np.uint8)
                    .reshape(h, w, 3)
                    .astype(np.int64)
                )
                ys = (np.arange(grid) * h) // grid
                xs = (np.arange(grid) * w) // grid
                cells = px[np.ix_(ys, xs)]  # (grid, grid, BGR)
                lum = (
                    114 * cells[:, :, 0]
                    + 587 * cells[:, :, 1]
                    + 299 * cells[:, :, 2]
                )
                mean = int(lum.sum()) // (grid * grid)  # non-negative
                bits = "".join(
                    "1" if v > mean else "0" for v in lum.flatten()
                )
                rows.append((mid, w, h, bits))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "ahash"]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id bigint, width int, height int, ahash string"
    )


def _dct_table(n: int) -> list[int]:
    """Integer DCT-II coefficient table C[u][y] = cos(pi*(2y+1)*u/(2n))
    flattened row-major (index u*n + y), quantized ONCE in Python to
    1e-6 units with decimal ROUND_HALF_UP (the BENFORD_P6 / _dft_tables
    rule) — transcendentals never cross engines raw; the engine and the
    SQL oracle embed THESE integers as literals, so every downstream
    product, truncation, and comparison is exact integer arithmetic."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def q(x: float) -> int:
        return int(
            (Decimal(repr(x)) * 1_000_000).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )

    return [
        q(math.cos(math.pi * (2 * y + 1) * u / (2 * n)))
        for u in range(n)
        for y in range(n)
    ]


def image_phash(media: DataFrame, grid: int = 16, block: int = 8) -> DataFrame:
    """Perceptual DCT hash (pHash) image fingerprint — aHash's robust
    sibling: instead of comparing raw cells to the mean (sensitive to
    local texture), compare the image's LOW-FREQUENCY structure —
    nearest-neighbor downsample to ``grid``×``grid`` integer BT.601
    luma, 2-D DCT-II, keep the top-left ``block``×``block``
    coefficients EXCLUDING the DC term (pure brightness — dropping it
    makes the hash approximately brightness-invariant), bit = coeff
    greater than the block's lower median. Near-identical images agree
    on coarse structure and collide; hamming distance tracks visual
    difference through blur/noise that flips aHash bits.

    Exact end to end (the audio-DFT discipline): the DCT basis is the
    1e-6-unit integer table :func:`_dct_table`; the row pass C·L stays
    in int64 (≤ grid·1e6·255000), is rescaled by ONE truncate-toward-
    zero division by 1e6 (sign·(abs // 1e6) — the resample_rational
    rule, floor-vs-trunc on negatives differs across engines), and the
    column pass (C·L)'·Cᵀ stays ≤ grid·grid·255000·1e6 in int64. The
    median is the SORTED block's element at 0-based index
    (block²-1-1)//2 — a pinned integer pick, no float averaging of
    middle elements. Bits emit as the (block²-1)-char bit STRING (the
    ahash engine-portable-key rule).

    Arrow-batched ``mapInPandas``; map-only, zero exchanges. Output:
    (media_id, width, height, phash).
    """
    if grid < 2:
        raise ValueError("grid must be >= 2")
    if not 1 < block <= grid:
        raise ValueError("need 1 < block <= grid")
    import numpy as np

    C = np.array(_dct_table(grid), dtype=np.int64).reshape(grid, grid)
    nbits = block * block - 1
    med_idx = (nbits - 1) // 2

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, body = decode_bmp(bytes(p))
                px = (
                    np.frombuffer(body, dtype=np.uint8)
                    .reshape(h, w, 3)
                    .astype(np.int64)
                )
                ys = (np.arange(grid) * h) // grid
                xs = (np.arange(grid) * w) // grid
                cells = px[np.ix_(ys, xs)]  # (grid, grid, BGR)
                lum = (
                    114 * cells[:, :, 0]
                    + 587 * cells[:, :, 1]
                    + 299 * cells[:, :, 2]
                )  # <= 255000, exact
                m1 = C @ lum  # |.| <= grid * 1e6 * 255000 ~ 4e12
                m1 = np.sign(m1) * (np.abs(m1) // 1_000_000)
                d = m1 @ C.T  # |.| <= grid^2 * 255000 * 1e6 ~ 6.5e13
                low = d[:block, :block].flatten()[1:]  # drop DC
                med = int(np.sort(low)[med_idx])
                bits = "".join("1" if int(v) > med else "0" for v in low)
                rows.append((mid, w, h, bits))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "phash"]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id bigint, width int, height int, phash string"
    )


def resample_rational(
    media: DataFrame,
    up: int,
    down: int,
    taps: tuple[int, ...] = (1, 2, 1),
) -> DataFrame:
    """Rational-rate polyphase resample (rate × up/down — e.g. 8 kHz →
    12 kHz at up=3, down=2): zero-stuff by ``up``, integer-tap FIR,
    take every ``down``-th filtered sample. Generalizes
    :func:`resample_fir` (up=1) to NON-integer ratios — the standard
    DSP structure, with the zero-stuffed signal never materialized:
    output m reads only the real samples its tap window hits
    (positions where (m·down + k) % up == 0).

    Determinism: all-integer — tap products in int64, gain compensation
    ×``up`` (zero-stuffing divides energy by up), ONE truncate-toward-
    zero division by sum(taps) per output — every sample reproducible
    from source bytes by a SQL oracle. Convex bound: |y| <= up·max|x|
    can exceed int16 when up > 1 and the window hits a single extreme
    sample, so outputs clamp to int16 (clamping is deterministic).

    Output rate is ``rate * up // down`` (exact when down divides
    rate·up — callers pick musical ratios). Arrow-batched mapInPandas;
    map-only.
    """
    if up < 1 or down < 1:
        raise ValueError("up and down must be >= 1")
    if not taps or any(t < 0 for t in taps) or sum(taps) < 1:
        raise ValueError("taps must be non-empty, non-negative, sum >= 1")
    import numpy as np

    den = int(sum(taps))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                rate, channels, frames = decode_wav(bytes(p))
                fr = np.frombuffer(frames, dtype="<i2").reshape(-1, channels)
                n = fr.shape[0]
                n_up = n * up
                n_out = (n_up + down - 1) // down
                acc = np.zeros((n_out, channels), dtype=np.int64)
                m = np.arange(n_out)
                for k, t in enumerate(taps):
                    pos = m * down + k  # position in the zero-stuffed stream
                    hits = pos % up == 0
                    src = pos // up
                    ok = hits & (src < n)
                    acc[ok] += t * up * fr[src[ok]].astype(np.int64)
                out = np.sign(acc) * (np.abs(acc) // den)
                out = np.clip(out, -32768, 32767).astype(np.int16)
                payload = encode_wav(rate * up // down, channels, out.tobytes())
                rate2, ch2, frames2 = decode_wav(payload)
                s2 = np.frombuffer(frames2, dtype="<i2").astype(np.int32)
                rows.append((mid, rate2, ch2, len(frames2) // (ch2 * 2),
                             payload, list(s2)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "channels",
                         "n_frames", "payload", "samples"],
            )

    return media.select("media_id", "payload").mapInPandas(
        run,
        "media_id bigint, sample_rate int, channels int, n_frames bigint, "
        "payload binary, samples array<int>",
    )


def _dft_tables(n_window: int) -> tuple[list[int], list[int]]:
    """Integer DFT coefficient tables: cos/sin(2*pi*m/N) for m in
    0..N-1, quantized ONCE in Python to 1e-6 units with decimal
    ROUND_HALF_UP (the BENFORD_P6 rule) — transcendentals never cross
    engines raw; both the engine expressions and the SQL oracle embed
    THESE integers as literals, so every downstream product and sum is
    exact integer arithmetic."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def q(x: float) -> int:
        return int(
            (Decimal(repr(x)) * 1_000_000).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )

    cos_u = [q(math.cos(2 * math.pi * m / n_window)) for m in range(n_window)]
    sin_u = [q(math.sin(2 * math.pi * m / n_window)) for m in range(n_window)]
    return cos_u, sin_u


def decode_samples(media: DataFrame) -> DataFrame:
    """Decode WAV payloads to their raw int16 samples (interleaved if
    multichannel) as an ``array<int>`` column — the Arrow-batched
    bridge from opaque binary to JVM-side signal processing. Everything
    AFTER this (windowing, spectral sums) stays in codegen."""
    import numpy as np

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                rate, channels, frames = decode_wav(bytes(p))
                s = np.frombuffer(frames, dtype="<i2").astype(np.int32)
                rows.append((mid, rate, channels, list(s)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "channels", "samples"],
            )

    return media.select("media_id", "payload").mapInPandas(
        run,
        "media_id bigint, sample_rate int, channels int, samples array<int>",
    )


def audio_dft_energy(
    media: DataFrame,
    n_window: int = 64,
    freqs: tuple[int, ...] = (1, 4, 8, 16),
) -> DataFrame:
    """Spectral band energies per non-overlapping ``n_window``-sample
    window at selected DFT bins — the frequency-domain audio screen
    (tone detection, bandwidth checks, silence/noise triage) that
    normally needs an FFT library; here it is EXACT distributed integer
    arithmetic: |X_f|^2 = (sum s_n*cos_u[(f*n)%N])^2 +
    (sum s_n*sin_u[(f*n)%N])^2 in 1e-12 units, with the cos/sin tables
    quantized once in Python (:func:`_dft_tables`) and embedded as
    integer literals in BOTH engines.

    Headroom: |term| <= 32767*1e6, window sums <= N*that ~ 2.1e12
    (bigint), squares <= 4.5e24 summed in DECIMAL(38,0) — overflow-free.

    Plan: one Arrow decode pass (:func:`decode_samples`), posexplode,
    ONE (media, window) hash aggregation carrying 2*len(freqs)
    conditional sums — map-side combined, shuffle rows = windows, never
    samples. The last window of each clip may be partial
    (``n_in_window`` reports it; energies are over the samples present,
    the standard short-block convention).

    Output: media_id, win (0-based), n_in_window, and per selected bin
    f: ``e{f}_u2`` (exact integer |X_f|^2 in 1e-12 units, VARCHAR) and
    ``e{f}`` (double, /1e12).
    """
    if n_window < 2:
        raise ValueError(f"n_window must be >= 2, got {n_window}")
    if not freqs or any(not 0 <= f < n_window for f in freqs):
        raise ValueError(f"freqs must be in [0, {n_window}), got {freqs}")
    cos_u, sin_u = _dft_tables(n_window)
    cos_arr = F.array(*[F.lit(c) for c in cos_u])
    sin_arr = F.array(*[F.lit(c) for c in sin_u])
    s = decode_samples(media).select(
        "media_id",
        F.posexplode("samples").alias("_pos", "_v"),
    )
    base = s.select(
        "media_id",
        (F.col("_pos") / F.lit(n_window)).cast("long").alias("win"),
        (F.col("_pos") % F.lit(n_window)).alias("_m"),
        F.col("_v").cast("long").alias("_v"),
    )
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).alias("n_in_window")]
    for f in freqs:
        idx = (F.col("_m") * F.lit(f)) % F.lit(n_window) + F.lit(1)
        term_c = F.col("_v") * F.element_at(cos_arr, idx)
        term_s = F.col("_v") * F.element_at(sin_arr, idx)
        aggs.append(F.sum(term_c).cast(dec).alias(f"_re{f}"))
        aggs.append(F.sum(term_s).cast(dec).alias(f"_im{f}"))
    g = base.groupBy("media_id", "win").agg(*aggs)
    out_cols = ["media_id", "win", "n_in_window"]
    sel = [F.col("media_id"), F.col("win"), F.col("n_in_window")]
    for f in freqs:
        u2 = (
            F.col(f"_re{f}") * F.col(f"_re{f}")
            + F.col(f"_im{f}") * F.col(f"_im{f}")
        ).cast(dec)
        sel.append(u2.cast("string").alias(f"e{f}_u2"))
        sel.append((u2.cast("double") / F.lit(1e12)).alias(f"e{f}"))
        out_cols += [f"e{f}_u2", f"e{f}"]
    return g.select(*sel)
