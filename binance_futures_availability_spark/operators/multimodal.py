"""Multimodal column plumbing — opaque binary media + typed metadata.

North-star extension: treat image/audio/video as ``binary`` columns with a
metadata struct, and run decode / feature-extract / frame-sample as
Arrow-batched Pandas functions over ``mapInPandas``. The decode step is
gated on an import probe: with PIL present it is a real mapInPandas decode
(``decode_image``); without codecs it fails fast with NotImplementedError
— either way the Spark-side plumbing (schema, batch shape, partitioning,
UDF signatures) is real and tested.

Scale design: media bytes never hit the driver; ``mapInPandas`` streams
Arrow batches through Python workers partition-by-partition. Metadata-only
queries prune the binary column at the parquet scan (columnar projection),
which is THE reason to store media alongside metadata instead of joining
out-of-band files.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: media asset schema: opaque bytes + typed metadata
MEDIA_ASSET = StructType(
    [
        StructField("asset_id", LongType(), nullable=False),
        StructField("media", BinaryType(), nullable=True),
        StructField("media_type", StringType(), nullable=False),
        StructField("n_bytes", LongType(), nullable=False),
        StructField("source", StringType(), nullable=True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), nullable=False),
        StructField("n_bytes", LongType(), nullable=False),
        StructField("digest", StringType(), nullable=False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), nullable=False),
        StructField("frame_no", IntegerType(), nullable=False),
        StructField("frame_bytes", LongType(), nullable=False),
    ]
)


def documents_as_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build a media-asset DataFrame from the documents table (text→bytes).

    Stands in for real image/audio ingestion; the binary column is genuinely
    opaque downstream.
    """
    return docs.select(
        F.col(id_col).alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        F.col("source"),
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Feature-extract over mapInPandas: byte length + md5 digest.

    The digest doubles as the deterministic stand-in for an embedding model
    forward pass; swapping in a real model changes only the body of
    ``batch_fn``, not the plumbing. Arrow-batched; no row-at-a-time Python.
    """

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": pdf["media"].map(len).astype("int64"),
                    "digest": pdf["media"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return assets.select("asset_id", "media").mapInPandas(batch_fn, FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, frame_size: int = 64, max_frames: int = 4) -> DataFrame:
    """Frame-sample plumbing: split media bytes into fixed-size frames.

    Deterministic fake for video frame extraction — the partitioning, batch
    iteration, and one-to-many output shape are exactly what a real ffmpeg
    UDF needs.
    """

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, sizes = [], [], []
            for aid, media in zip(pdf["asset_id"], pdf["media"]):
                b = bytes(media)
                for i in range(min(max_frames, (len(b) + frame_size - 1) // frame_size)):
                    chunk = b[i * frame_size : (i + 1) * frame_size]
                    ids.append(aid)
                    nos.append(i)
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(nos, dtype="int32"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return assets.select("asset_id", "media").mapInPandas(batch_fn, FRAME_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), nullable=False),
        StructField("media", BinaryType(), nullable=True),
        StructField("n_bytes_in", LongType(), nullable=False),
        StructField("n_bytes_out", LongType(), nullable=False),
    ]
)


def resize_media(assets: DataFrame, target_bytes: int = 256) -> DataFrame:
    """Resize plumbing: binary in → smaller binary out, Arrow-batched.

    Deterministic stand-in for pixel resampling: an even byte stride
    ``k = ceil(len/target)`` subsamples each asset to ≤ ``target_bytes``
    (a real implementation swaps the stride slice for PIL's resize; the
    binary→binary mapInPandas contract, output schema, and size
    accounting are exactly what it needs). Output sizes are pure
    arithmetic over input length, so the operator is oracle-checkable
    without codecs.
    """

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, n_in, n_out = [], [], []
            for media in pdf["media"]:
                b = bytes(media)
                k = -(-len(b) // target_bytes) if b else 1
                r = b[::k]
                outs.append(r)
                n_in.append(len(b))
                n_out.append(len(r))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media": outs,
                    "n_bytes_in": pd.Series(n_in, dtype="int64"),
                    "n_bytes_out": pd.Series(n_out, dtype="int64"),
                }
            )

    return assets.select("asset_id", "media").mapInPandas(batch_fn, RESIZE_SCHEMA)


DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), nullable=False),
        StructField("height", IntegerType(), nullable=True),
        StructField("width", IntegerType(), nullable=True),
        StructField("channels", IntegerType(), nullable=True),
        StructField("mode", StringType(), nullable=True),
    ]
)


def has_image_codec() -> bool:
    """True when an image codec library (PIL) is importable."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        return False
    return True


def decode_image(assets: DataFrame) -> DataFrame:
    """Image decode via PIL when available; NotImplementedError otherwise.

    The decode is a ``mapInPandas`` with the same Arrow-batched plumbing
    contract as ``extract_features`` (media bytes never hit the driver;
    one PIL decode per asset per batch). Undecodable or null media yields
    NULL dimension columns rather than failing the batch — at corpus scale
    a sliver of corrupt assets must not kill the job. The import is probed
    at PLAN-construction time so an environment without codecs fails fast
    with a clear message instead of erroring mid-job on every executor.
    """
    if not has_image_codec():
        raise NotImplementedError(
            "image decode requires PIL/libvips, not present in this "
            "environment; use extract_features for the tested plumbing "
            "pattern"
        )

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            heights, widths, channels, modes = [], [], [], []
            for media in pdf["media"]:
                try:
                    img = Image.open(io.BytesIO(bytes(media)))
                    heights.append(img.height)
                    widths.append(img.width)
                    channels.append(len(img.getbands()))
                    modes.append(img.mode)
                except Exception:  # noqa: BLE001 — corrupt/undecodable asset
                    heights.append(None)
                    widths.append(None)
                    channels.append(None)
                    modes.append(None)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "height": pd.Series(heights, dtype="Int32"),
                    "width": pd.Series(widths, dtype="Int32"),
                    "channels": pd.Series(channels, dtype="Int32"),
                    "mode": pd.Series(modes, dtype="object"),
                }
            )

    return assets.select("asset_id", "media").mapInPandas(batch_fn, DECODE_SCHEMA)
