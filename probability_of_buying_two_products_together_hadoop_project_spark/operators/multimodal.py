"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio codecs, so DECODE IS STUBBED — a
deterministic fake decoder stands in (clearly marked below) — but the
Spark-side plumbing is real and tested: binary schema, typed metadata
struct, Arrow-batched ``mapInPandas`` with explicit output schema, and
batch-shape handling, which is exactly what a real decoder would plug
into.

Scale notes: binary payloads stay in-executor (never collected);
``mapInPandas`` streams Arrow record batches, so peak memory is one batch
of payloads, controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def decode_image(payload: bytes) -> object:
    """STUB: real image decode requires a codec library not present in
    this container. The Spark plumbing around it is real."""
    raise NotImplementedError(
        "image decode requires an image codec library (not installed); "
        "plug a real decoder in here"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoder': fixed-dim feature from byte histogram.
    Stands in for decode->resize->embed so the pipeline shape is testable."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = max(len(payload), 1)
    return [round(a / n, 6) for a in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` so a real decoder can do per-batch library calls; the
    output schema is explicit and stable (FEATURE_SCHEMA).
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": [_fake_feature(p, dim) for p in pdf["payload"]],
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
