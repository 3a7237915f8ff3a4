"""Multimodal (image/audio/video) column plumbing.

Model: media payloads are opaque ``binary`` columns alongside typed
metadata (mime, width/height, sample rate, …). The Spark-side plumbing —
schemas, partitioning, Arrow batch shape, ``mapInPandas`` signatures — is
real and tested. Decode/resize take a ``codec`` argument:

- ``"pil"``  — real Pillow decode/resize (raises if PIL is absent);
- ``"fake"`` — deterministic stand-in (byte-derived dims/features) used
  by the oracle-checked queries so results are reproducible cross-engine;
- ``"auto"`` — PIL when importable, fake otherwise (the default).

PIL is not installed in this container, so ``"auto"`` resolves to the
fake here; the PIL bodies are real code and unit-tested via
``importorskip`` (``tests/test_multimodal_codecs.py``).

Scale design:
- Decode/feature-extract runs as ``mapInPandas`` — Arrow-batched, one
  Python worker per core, no JVM round-trips per row. Batch size is
  governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``; for large
  media rows set it low (e.g. 64) so a batch fits in worker memory.
- Media tables should be written with the payload column LAST and
  metadata columns first, so metadata-only queries never touch payload
  pages (parquet column pruning).
- Frame sampling / resizing emit one row per frame via the iterator
  form of ``mapInPandas`` — constant memory per batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real codecs are not installed in this environment
    import PIL.Image  # noqa: F401

    _HAS_CODECS = True
except ImportError:
    _HAS_CODECS = False

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, source_col: str, mime: str, id_col: str = "doc_id"
) -> DataFrame:
    """Treat a column's bytes as an opaque media payload with typed
    metadata (the storage shape every multimodal table uses)."""
    payload = F.encode(F.col(source_col), "utf-8")
    return df.select(
        F.col(id_col),
        F.lit(mime).alias("mime"),
        F.length(payload).cast("long").alias("byte_len"),
        payload.alias("payload"),
    )


def _resolve_codec(codec: str) -> str:
    """Map a requested codec mode to the concrete one used on workers."""
    if codec == "auto":
        return "pil" if _HAS_CODECS else "fake"
    if codec not in ("pil", "fake"):
        raise ValueError(f"unknown codec {codec!r}: expected auto|pil|fake")
    return codec


def _fake_decode(payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in for an image decoder: derives 'dimensions'
    and a tiny 'feature' vector from the bytes themselves. Used by the
    oracle-checked queries (cross-engine reproducible) and as the
    fallback when PIL is absent."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    feature = [float((payload[i % n] if n else 0) % 17) for i in range(4)]
    return {"width": width, "height": height, "feature": feature}


def _pil_decode(payload: bytes) -> dict[str, Any]:
    """Real decoder: PIL opens the payload; the feature vector is the
    mean luma of the four image quadrants (a tiny but genuine perceptual
    descriptor — same 4-float shape as the fake, so downstream schemas
    and the similarity operators are codec-agnostic)."""
    import io

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(bytes(payload)))
    img.load()
    w, h = img.size
    gray = img.convert("L")
    half_w, half_h = max(1, w // 2), max(1, h // 2)
    feature = []
    for top in (0, half_h):
        for left in (0, half_w):
            box = (left, top, min(left + half_w, w), min(top + half_h, h))
            region = gray.crop(box)
            hist = region.histogram()
            total = sum(hist) or 1
            mean = sum(i * c for i, c in enumerate(hist)) / total
            feature.append(float(mean) / 255.0)
    return {"width": w, "height": h, "feature": feature}


def decode_image_batches(codec: str = "auto"):
    """``mapInPandas`` body factory: payload → (dims, feature vector).

    ``codec="pil"`` decodes with Pillow; ``"fake"`` uses the
    deterministic stand-in; ``"auto"`` picks PIL when importable. The
    Arrow batch shape, output schema and iterator protocol are identical
    across codecs — that is the part the engine owns.
    """
    mode = _resolve_codec(codec)
    decode = _pil_decode if mode == "pil" else _fake_decode

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": pdf["mime"],
                    "byte_len": pdf["byte_len"].astype("int64"),
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "feature": [d["feature"] for d in decoded],
                }
            )

    return body


def decode_images(media: DataFrame, codec: str = "auto") -> DataFrame:
    """Decode/feature-extract a media table (payload binary + metadata)."""
    return media.mapInPandas(decode_image_batches(codec), schema=IMAGE_META_SCHEMA)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 1024, id_col: str = "doc_id"
) -> DataFrame:
    """'Frame sampling' plumbing demo: emit one row per sampled offset of
    each payload — the row-expanding iterator shape a video frame sampler
    uses (one input row → many output rows, constant memory)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("chunk", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r["payload"]
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    rows.append(
                        (r[id_col], i, off, payload[off : off + every_n_bytes])
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "offset", "chunk"]
            )

    return media.mapInPandas(gen, schema=out_schema)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for an image resize: scales the byte length
    proportionally to the pixel-count ratio vs the fake-decoded original
    dimensions, so output size tracks target size. Oracle-reproducible
    cross-engine; fallback when PIL is absent."""
    meta = _fake_decode(payload)
    ratio = (w * h) / max(1, meta["width"] * meta["height"])
    n = max(1, int(len(payload) * min(ratio, 1.0)))
    return payload[:n]


def _pil_resize(payload: bytes, w: int, h: int) -> bytes:
    """Real resize: PIL decode → ``Image.resize`` → re-encode in the
    source format (PNG when the source format is unknown)."""
    import io

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(bytes(payload)))
    fmt = img.format or "PNG"
    resized = img.resize((w, h))
    buf = io.BytesIO()
    resized.save(buf, format=fmt)
    return buf.getvalue()


def resize_images(
    media: DataFrame, width: int, height: int, codec: str = "auto"
) -> DataFrame:
    """Resize plumbing: payload → payload at (width, height) via
    ``mapInPandas``. ``codec="pil"`` runs PIL ``Image.resize``; the
    Arrow batch shape, binary-in/binary-out schema, and constant target
    dims are identical across codecs. Pure projection — zero shuffle."""
    mode = _resolve_codec(codec)
    resize = _pil_resize if mode == "pil" else _fake_resize

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": pdf["mime"],
                    "target_w": width,
                    "target_h": height,
                    "payload": [resize(p, width, height) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(body, schema=RESIZED_SCHEMA)


def extract_feature_batches(dim: int):
    """``mapInPandas`` body factory: payload → ``dim``-sized embedding.

    The stub featurizer is deterministic (md5-seeded pseudo-embedding) so
    pipelines and tests are reproducible; with a real model this is where
    the ONNX/torch batch inference call goes — the Arrow batch shape,
    schema and iterator protocol stay identical, which is the part the
    engine owns.
    """
    import hashlib

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                h = hashlib.md5(bytes(payload)).digest()
                feats.append(
                    [float(h[(i * 7 + 3) % 16]) / 255.0 for i in range(dim)]
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "embedding": feats}
            )

    return body


def extract_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """Media table → (doc_id, embedding array<float>) — the output plugs
    straight into the similarity operators (corpus/similarity.py):
    ANN top-k, hyperplane LSH, near-dup pairs."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return media.mapInPandas(extract_feature_batches(dim), schema=schema)


def media_near_dup(
    media: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    bands: int = 4,
    planes: int = 16,
    parallelism: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Perceptual near-duplicate media pairs: feature-extract every
    payload (Arrow-batched; real model swaps in at
    :func:`extract_feature_batches`), then reuse the banded
    random-hyperplane LSH near-dup machinery over the feature vectors —
    the multimodal entry point into the dedup family. Returns
    (id_a, id_b, cos_sim ≥ threshold).

    Scale shape is inherited: featurize is a pure projection, candidate
    generation is bucket-local equi-joins on signature bands (never
    all-pairs), verification touches candidates only."""
    from modular_etl_data_platform_spark.corpus.similarity import (
        embedding_near_dup_pairs,
    )

    feats = extract_features(media, dim=dim)
    return embedding_near_dup_pairs(
        feats,
        threshold=threshold,
        id_col="doc_id",
        vec_col="embedding",
        use_lsh_prefilter=True,
        bands=bands,
        planes=planes,
        dim=dim,
        parallelism=parallelism,
        max_bucket_size=max_bucket_size,
    )
