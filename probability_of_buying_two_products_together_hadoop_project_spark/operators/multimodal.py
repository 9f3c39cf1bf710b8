"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Decode is REAL for 24-bit uncompressed BMP — a pure-Python parser below
(BMP needs no codec library: fixed 54-byte header + padded BGR rows).
Formats that genuinely need codec libraries not present in this container
(JPEG/PNG/audio/video) remain stubbed behind ``decode_image``'s
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


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an image payload -> (width, height, BGR bytes, top-down).

    REAL for 24-bit uncompressed BMP (pure-Python parser above). Other
    formats require codec libraries not present in this container and
    raise — plug a real decoder into this branch."""
    if payload is not None and payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "only BMP decodes without a codec library; plug a JPEG/PNG "
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
        if p is not None and p[:2] == b"BM":
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
