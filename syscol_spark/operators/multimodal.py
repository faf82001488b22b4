"""Multimodal column operators (north-star): image/audio/video as opaque
binary columns + typed metadata, with decode / feature-extraction / resize /
frame-sampling as Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing — schema, partition-preserving batch iteration, UDF
signatures, output shapes — is real and tested. The actual media decoding is
STUBBED (``decoder="stub"``) because no image/audio libraries exist in this
container: the stub derives a deterministic fake feature vector from the blob
bytes (sha256-seeded), so downstream operators (similarity search, dedup)
exercise realistic shapes end-to-end. Passing ``decoder="pillow"`` etc.
raises NotImplementedError at plan time, marking exactly where a real
decoder plugs in.

Scale design: mapInPandas streams Arrow batches (no per-row Python), blobs
never shuffle unless the caller repartitions, and feature extraction is a
pure map — at 100 TB the only cost is one scan + the Python worker lanes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal asset schema: opaque payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("blob", BinaryType(), False),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

FEATURE_DIM = 64

_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)

_FRAMES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_blob", BinaryType(), False),
    ]
)


def _stub_feature(blob: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake embedding: sha256-expanded bytes → [-1,1) floats.
    Stable across runs/machines, so tests and dedup pipelines are exact.
    Definition: digest k is sha256(blob || k.to_bytes(4,'big')); each digest
    yields 8 big-endian uint32s mapped to uint32/2^31 - 1.0. The batch path
    below (_stub_features_batch) MUST stay bit-identical to this."""
    return _stub_features_batch([blob], dim)[0]


def _stub_features_batch(blobs: list[bytes], dim: int = FEATURE_DIM) -> list[list[float]]:
    """Vectorized stub: hash each blob ONCE, derive the counter-suffixed
    digests from the saved hash state (hashlib.copy() + 4-byte update), then
    decode every digest in the batch with a single numpy frombuffer pass.
    Bit-identical to the per-row definition: sha256(seed||ctr) == copy-of-
    sha256(seed) updated with ctr, and uint32/2^31-1.0 is the same IEEE
    double op whether done per-int or as a numpy array."""
    n_digests = (dim + 7) // 8  # 8 uint32s per 32-byte digest
    counters = [c.to_bytes(4, "big") for c in range(n_digests)]
    parts: list[bytes] = []
    for blob in blobs:
        base = hashlib.sha256(blob or b"\x00")
        for cb in counters:
            h = base.copy()
            h.update(cb)
            parts.append(h.digest())
    arr = np.frombuffer(b"".join(parts), dtype=">u4").astype(np.float64) / 2**31 - 1.0
    return arr.reshape(len(blobs), n_digests * 8)[:, :dim].tolist()


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter: model the documents table as binary assets (the container has
    no real media; the pipeline shape is identical)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "UTF-8").alias("blob"),
        F.create_map(F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")).alias("meta"),
    )


def extract_features(assets: DataFrame, *, decoder: str = "stub", dim: int = FEATURE_DIM) -> DataFrame:
    """blob → feature vector via mapInPandas (Arrow batches).

    ``decoder="stub"`` → deterministic fake features (see _stub_feature).
    Any real decoder name raises NotImplementedError: that is the single
    integration point for pillow/torchvision/ffmpeg in a real deployment.
    """
    if decoder != "stub":
        raise NotImplementedError(
            f"decoder {decoder!r}: media libraries are not available in this "
            "environment; plug a real decode here (same batch contract)"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raw = [bytes(b) if b is not None else b"" for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(b) for b in raw],
                    "feature": _stub_features_batch(raw, dim),
                }
            )

    return assets.mapInPandas(batches, schema=_FEATURES_SCHEMA)


_RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("blob", BinaryType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ]
)


def resize_assets(assets: DataFrame, *, width: int = 64, height: int = 64, decoder: str = "stub") -> DataFrame:
    """Image-resize stage. ``stub`` decoder emits a deterministic
    width×height byte grid sampled from the source blob (sha-independent,
    pure indexing) with the target dimensions as typed metadata — the real
    pillow/opencv resize plugs into the same mapInPandas contract and
    schema. Raises NotImplementedError for real decoders (not available in
    this environment)."""
    if decoder != "stub":
        raise NotImplementedError(
            f"decoder {decoder!r}: image libraries unavailable; plug the real resize here"
        )
    n_out = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ks = np.arange(n_out, dtype=np.int64)
        for pdf in it:
            def one(b: bytes) -> bytes:
                raw = bytes(b) or b"\x00"
                # nearest-neighbor byte sampling: output k maps to source
                # index k*len/n_out — the shape of a real resize kernel.
                # One numpy gather per row (no per-byte Python loop);
                # (ks*n)//n_out is the same integer math as the scalar form,
                # so outputs stay byte-identical to the original definition.
                src = np.frombuffer(raw, dtype=np.uint8)
                return src[(ks * len(raw)) // n_out].tobytes()

            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "blob": pdf["blob"].map(one),
                    "width": width,
                    "height": height,
                }
            )

    return assets.mapInPandas(batches, schema=_RESIZED_SCHEMA)


def sample_frames(assets: DataFrame, *, every_n_bytes: int = 256, max_frames: int = 8) -> DataFrame:
    """Video-style frame sampling: one output row per sampled "frame"
    (byte-window stand-in). Real ffmpeg sampling plugs into the same
    mapInPandas contract — N output rows per input row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        every = every_n_bytes
        for pdf in it:
            if not len(pdf):  # empty Arrow batch: np.repeat below would raise
                continue
            raws = [bytes(b) for b in pdf["blob"]]
            # frames per row, vectorized: min(max_frames, max(1, len//every))
            lens = np.fromiter((len(r) for r in raws), dtype=np.int64, count=len(raws))
            counts = np.minimum(max_frames, np.maximum(1, lens // every))
            total = int(counts.sum())
            ids = np.repeat(pdf["asset_id"].to_numpy(), counts)
            # frame_idx = 0..count-1 within each row: global arange minus the
            # repeated start offset of each row's frame block
            starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
            idxs = (np.arange(total) - np.repeat(starts, counts)).astype(np.int32)
            # One flat buffer + ONE 2D fancy-index gather extracts every
            # full-width frame in the batch; V-dtype (not S — S trims
            # trailing NULs) views the gather as exact fixed-width bytes.
            # No per-frame Python: the only row-level fallback is blobs
            # shorter than one frame, which emit their raw bytes untouched.
            buf = np.frombuffer(b"".join(raws), dtype=np.uint8)
            row_off = np.concatenate(([0], np.cumsum(lens)))[:-1]
            frame_off = np.repeat(row_off, counts) + idxs.astype(np.int64) * every
            full = np.repeat(lens >= every, counts)
            blobs = np.empty(total, dtype=object)
            if full.any():
                gathered = buf[frame_off[full, None] + np.arange(every)]
                blobs[full] = np.ascontiguousarray(gathered).view(f"V{every}").ravel().tolist()
            if not full.all():
                blobs[~full] = [raws[r] for r in np.flatnonzero(lens < every)]
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame_blob": list(blobs)}
            )

    return assets.mapInPandas(batches, schema=_FRAMES_SCHEMA)


def perceptual_hash(assets: DataFrame, *, dim: int = FEATURE_DIM, n_bits: int = 60) -> DataFrame:
    """aHash-shaped perceptual fingerprint over the decoded representation:
    bit i = (feature_i > mean of the vector) — the classic average-hash
    construction, computed on whatever the decoder emits. With the
    deterministic sha256 stub decoder, only byte-identical blobs collide
    (avalanche); swap in a real pixel decoder and visually-near-duplicate
    images land at small Hamming distances with the SAME downstream
    plumbing (pigeonhole banding + exact Hamming verify, shared with
    SimHash). 60 bits so every 2^i term stays positive in a signed long on
    both engines — the q_simhash width lesson.

    Output: (asset_id, modality, phash long). Bits derive from the first
    ``n_bits`` feature dims; the mean is over the full vector. Everything
    after the Arrow-batched feature extraction is codegen'd expressions.
    """
    from syscol_spark.functions.text import _bind_once

    feats = extract_features(assets, dim=dim)
    fd = F.transform(F.col("feature"), lambda x: x.cast("double"))

    def fp_of(f: Column) -> Column:
        mean = F.aggregate(f, F.lit(0.0), lambda a, x: a + x) / dim

        def bits_of(m: Column) -> Column:
            return F.aggregate(
                F.sequence(F.lit(0), F.lit(n_bits - 1)),
                F.lit(0).cast("long"),
                lambda acc, i: acc
                + F.when(
                    F.element_at(f, (i + 1).cast("int")) > m,
                    # 2^i as a double is exact for i <= 59, so the cast is too
                    F.pow(F.lit(2.0), i).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            )

        return _bind_once(mean, bits_of)

    return feats.select(
        "asset_id", "modality", _bind_once(fd, fp_of).alias("phash")
    )
