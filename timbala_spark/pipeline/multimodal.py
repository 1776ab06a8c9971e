"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step itself is STUBBED (no imaging/audio libraries in this
environment — see ``DecoderNotAvailable`` / the deterministic fake), but
the Spark-side machinery is real and tested: schema, Arrow-batched
``mapInPandas`` signatures, batch shaping, and partition strategy.

At scale the pattern is: keep payloads in their own parquet column
(never in the shuffle), decode/feature-extract with ``mapInPandas``
(Arrow batches, bounded memory via ``maxRecordsPerBatch``), and emit
narrow feature rows that downstream joins/aggregations shuffle instead
of the raw bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


class DecoderNotAvailable(NotImplementedError):
    """Raised by the real decode path: imaging/audio libraries are not
    installed in this environment. Use fake=True for a deterministic
    stand-in that exercises the full Spark plumbing."""


def _fake_decode(payload: bytes, media_type: str, n_features: int = 8):
    """Deterministic pseudo-decode: sha256-derived dimensions and
    features. Stands in for PIL/ffmpeg so the distributed plumbing is
    testable without the libraries."""
    digest = hashlib.sha256(payload or b"").digest()
    width = 16 + digest[0]
    height = 16 + digest[1]
    n_frames = 1 if media_type == "image" else 1 + digest[2] % 16
    feats = [b / 255.0 for b in digest[3 : 3 + n_features]]
    return width, height, n_frames, feats


def decode_features(
    media: DataFrame, fake: bool = False, n_features: int = 8
) -> DataFrame:
    """payload → (dims, frame count, feature vector) via Arrow-batched
    mapInPandas. The real decoder is stubbed (DecoderNotAvailable)."""

    def run(batches: Iterator, fake=fake, n_features=n_features):
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise DecoderNotAvailable(
                    "image/audio decoding libraries are not available; "
                    "pass fake=True for the deterministic test decoder"
                )
            out = {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "width": [],
                "height": [],
                "n_frames": [],
                "features": [],
            }
            # zip, not iterrows: pandas row materialization costs ~10x
            # per element and this loop runs once per media row
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                w, h, nf, feats = _fake_decode(payload, mtype, n_features)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """payload → resized payload (images only; other media pass through
    untouched). Same stub pattern as :func:`decode_features`: the real
    resampler needs an imaging library (``DecoderNotAvailable``), the
    fake emits sha256(payload ‖ WxH) so tests can assert the plumbing
    end-to-end deterministically. Output keeps ``MEDIA_SCHEMA`` with
    ``meta['width']/['height']`` set, so resize stages compose with
    decode/frame-sample. Payloads stay inside the mapInPandas batch —
    nothing here introduces a shuffle."""

    def run(batches: Iterator):
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise DecoderNotAvailable(
                    "image resampling libraries are not available; "
                    "pass fake=True for the deterministic test resizer"
                )
            payloads = []
            metas = []
            for payload, mtype, meta in zip(
                pdf["payload"], pdf["media_type"], pdf["meta"]
            ):
                m = dict(meta or {})
                if mtype == "image":
                    payloads.append(
                        hashlib.sha256(
                            (payload or b"") + f"{width}x{height}".encode()
                        ).digest()
                    )
                    # only images get the resize target stamped — a
                    # video/audio row keeps its real dimensions
                    m["width"] = str(width)
                    m["height"] = str(height)
                else:
                    payloads.append(payload)
                metas.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Plan frame sampling for video rows: emits (media_id, frame_idx)
    rows without touching payloads (metadata-driven, so the explode is
    narrow)."""
    n = F.coalesce(
        F.try_element_at(F.col("meta"), F.lit("n_frames")).cast("int"), F.lit(1)
    )
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def synthesize_media(spark, documents: DataFrame, n: int = 64) -> DataFrame:
    """Build a deterministic media table from document bytes (test
    fixture: payload = utf-8 text bytes). Selects ``doc_id < n`` (a
    pushdown-friendly predicate) rather than ``limit`` so the fixture
    is order-independent and oracle-reproducible."""
    base = documents.filter(F.col("doc_id") < n).select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.map_from_arrays(
            F.array(F.lit("n_frames")),
            F.array((F.col("doc_id") % 30 + 1).cast("string")),
        ).alias("meta"),
    )
    return base
