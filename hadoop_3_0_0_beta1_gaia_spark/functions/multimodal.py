"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference has no media operators; this is the LLM-pipeline extension
(BASELINE.json north star): treat media as ``binary`` columns with a typed
metadata struct, and run decode / feature-extract / resize / frame-sample as
Arrow-batched Pandas UDFs over ``mapInPandas``.

The actual codecs (Pillow/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are STUBBED: ``decode=fake`` produces a deterministic
md5-seeded byte/feature tensor of the right shape (so the Spark-side
plumbing — schema, batching, partitioning, UDF signatures — is fully real
and testable); ``decode=real`` raises NotImplementedError at the exact point
a codec would plug in.

Scale notes: media blobs dominate row size — keep
``spark.sql.files.maxPartitionBytes`` at 128 MB so a partition holds a
bounded number of blobs, and select metadata columns only (column pruning)
when the pipeline stage doesn't touch bytes. mapInPandas streams Arrow
batches, so one task never materializes more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("media", BinaryType(), True),  # opaque encoded bytes
        StructField("format", StringType(), True),  # e.g. jpeg/wav/mp4
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16


def _fake_features(seed: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a decoder+encoder: md5-seeded floats."""
    out: list[float] = []
    counter = 0
    raw = b""
    while len(out) < dim:
        raw = hashlib.md5(seed + counter.to_bytes(4, "big")).digest()
        for k in range(0, len(raw), 4):
            if len(out) >= dim:
                break
            out.append(int.from_bytes(raw[k : k + 4], "big") / 2**32)
        counter += 1
    return out


def duckdb_fake_feature_terms(text_sql: str, dim: int = FEATURE_DIM) -> list[str]:
    """DuckDB codegen twin of :func:`_fake_features` over a TEXT blob: one
    DOUBLE-typed term per feature, bit-identical to the Arrow float32 values
    the fake kernel emits (md5(seed || counter_be32) → 4-byte big-endian
    chunks / 2^32 → FLOAT4 → DOUBLE). NUL counter bytes ride in a
    ``decode(blob)`` string — DuckDB strings are length-prefixed, so md5
    hashes them fully."""
    terms = []
    for j in range(dim):
        counter, k = divmod(j, 4)
        cb = "".join(f"\\x{b:02x}" for b in counter.to_bytes(4, "big"))
        terms.append(
            f"CAST(CAST((('0x' || substr(md5(coalesce({text_sql}, '') || "
            f"decode('{cb}'::BLOB)), {1 + 8 * k}, 8))::BIGINT) / 4294967296.0 "
            "AS FLOAT4) AS DOUBLE)"
        )
    return terms


def decode_features(
    df: DataFrame, decode: str = "fake", dim: int = FEATURE_DIM
) -> DataFrame:
    """media bytes → feature vector (array<float>), Arrow-batched.

    Output schema: (media_id long, kind string, features array<float>).
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("features", ArrayType(FloatType()), True),
        ]
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real media decode requires an image/audio codec "
                    "(Pillow/ffmpeg) not present in this environment; "
                    "plug it in here — the batching/schema contract is final"
                )
            feats = [
                _fake_features(bytes(b) if b is not None else b"", dim)
                for b in pdf["media"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return df.mapInPandas(kernel, schema=schema)


def resize_stub(df: DataFrame, width: int, height: int, decode: str = "fake") -> DataFrame:
    """Image resize: metadata is updated for real (the Spark-side part); the
    pixel transform is the stubbed kernel (md5-rehash of bytes when fake)."""

    schema = MEDIA_SCHEMA

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("plug a real resize codec here")
            pdf = pdf.copy()
            pdf["media"] = [
                hashlib.md5(bytes(b) + b"resize").digest() if b is not None else None
                for b in pdf["media"]
            ]
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.mapInPandas(kernel, schema=schema)


def frame_sample(df: DataFrame, every_ms: int) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled timestamp
    (decode stubbed — the frame payload is a deterministic digest). Pure
    Spark-side: explode over the sampled timestamp grid from duration_ms."""
    grid = F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
    frames = df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(grid).alias("frame_ms"),
        F.md5(F.concat(F.col("media").cast("string"), F.lit(":"), F.col("duration_ms").cast("string"))).alias(
            "frame_digest"
        ),
    )
    return frames
