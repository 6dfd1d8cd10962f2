"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(north-star extension).

The decode libraries (PIL/torchaudio/ffmpeg) are NOT in this container, so
the media-decode step is stubbed behind ``media_decode_stub`` — but the
Spark-side plumbing is real and tested: binary columns, metadata structs,
Arrow-batched ``mapInPandas`` with explicit schemas, partition-friendly
shapes. Swapping the stub for a real decoder changes one function body,
nothing else.

Design for 100 TB of media:
- content stays an opaque ``binary`` column (parquet keeps it out of
  row-group stats; column pruning means metadata-only queries never read
  bytes);
- feature extraction is ``mapInPandas`` over Arrow batches — one Python
  worker per partition, zero driver involvement;
- frame/sample extraction yields MULTIPLE rows per input via the iterator
  contract (a flatMap, not a map).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..catalog import spread

#: metadata struct carried alongside every blob
MEDIA_META_SCHEMA = ("media_type string, n_bytes long, digest string, "
                     "width int, height int")


def attach_binary(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  media_type: str = "image/fake") -> DataFrame:
    """Build a blob table from the documents fixture: utf-8 bytes stand in
    for encoded media (deterministic; real pipelines read binary files via
    ``spark.read.format('binaryFile')``)."""
    # spread so each Arrow-batched Python worker gets a partition of blobs
    # (a single input file must not serialize the decode)
    return spread(docs, id_col).select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit(media_type).alias("media_type"),
    )


def media_decode_stub(content: bytes) -> dict:
    """STUB for the real media decoder (PIL.Image.open / librosa.load /
    av.open — unavailable in this container). Produces a deterministic fake:
    dimensions derived from the byte length, digest from the bytes.

    Replace the body with e.g.::

        img = PIL.Image.open(io.BytesIO(content))
        return {"width": img.width, "height": img.height, ...}
    """
    n = len(content)
    return {
        "n_bytes": n,
        "digest": hashlib.md5(content).hexdigest(),
        "width": n % 640 + 1,
        "height": n % 480 + 1,
    }


def extract_media_meta(blobs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode / feature-extract over Arrow batches. Output one row per blob
    with the typed metadata struct columns."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [media_decode_stub(c) for c in pdf["content"]]
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "media_type": pdf["media_type"].to_numpy(),
                "n_bytes": [m["n_bytes"] for m in metas],
                "digest": [m["digest"] for m in metas],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
            })

    return blobs.mapInPandas(
        decode, schema=f"{id_col} long, {MEDIA_META_SCHEMA}")


def sample_frames(blobs: DataFrame, every_n_bytes: int = 64,
                  max_frames: int = 8, id_col: str = "doc_id") -> DataFrame:
    """Frame/sample extraction: N output rows per input blob (video frame
    sampling / audio windowing shape). The stub 'frame' is the byte value at
    each sample offset; a real decoder yields image tensors per timestamp.

    Demonstrates the 1->N iterator contract of mapInPandas (flatMap)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, vals = [], [], [], []
            for did, content in zip(pdf[id_col], pdf["content"]):
                raw = bytes(content)
                for fi in range(min(max_frames, max(len(raw) // every_n_bytes, 0))):
                    off = fi * every_n_bytes
                    ids.append(did)
                    idxs.append(fi)
                    offs.append(off)
                    vals.append(raw[off])
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int32"),
                                "byte_offset": pd.Series(offs, dtype="int64"),
                                "sample_value": pd.Series(vals, dtype="int32")})

    return blobs.mapInPandas(
        frames,
        schema=f"{id_col} long, frame_idx int, byte_offset long, sample_value int")


def resize_stub(blobs: DataFrame, target_w: int = 224, target_h: int = 224,
                id_col: str = "doc_id") -> DataFrame:
    """Resize step (image preprocessing shape): content -> content', with
    dimension metadata updated. STUB: the 'resized' payload is a
    deterministic digest-tagged truncation of the original bytes; a real
    implementation decodes, PIL-resizes, re-encodes inside the same
    mapInPandas contract (bytes in, bytes out, one row per row)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, payloads, ws, hs = [], [], [], []
            for did, content in zip(pdf[id_col], pdf["content"]):
                raw = bytes(content)
                tag = hashlib.md5(
                    raw + f":{target_w}x{target_h}".encode()).digest()
                out_ids.append(did)
                payloads.append(tag + raw[: target_w * target_h // 64])
                ws.append(target_w)
                hs.append(target_h)
            yield pd.DataFrame({id_col: pd.Series(out_ids, dtype="int64"),
                                "content": payloads,
                                "width": pd.Series(ws, dtype="int32"),
                                "height": pd.Series(hs, dtype="int32")})

    return blobs.mapInPandas(
        resize, schema=f"{id_col} long, content binary, width int, height int")


def extract_features(blobs: DataFrame, dim: int = 16,
                     id_col: str = "doc_id") -> DataFrame:
    """Feature extraction (embedding shape): content -> array<float>. STUB:
    md5-seeded deterministic pseudo-features in [-1, 1) — the output column
    is schema-compatible with the `embeddings` table, so the similarity
    operators (cosine_topk, ann_*) consume it directly; swap the body for a
    real vision/audio encoder batch call in production."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for did, content in zip(pdf[id_col], pdf["content"]):
                raw = bytes(content)
                vals = []
                counter = 0
                while len(vals) < dim:
                    h = hashlib.md5(raw + counter.to_bytes(4, "big")).digest()
                    vals.extend(b / 128.0 - 1.0 for b in h)
                    counter += 1
                ids.append(did)
                vecs.append([float(v) for v in vals[:dim]])
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "embedding": vecs})

    return blobs.mapInPandas(feats, schema=f"{id_col} long, embedding array<float>")
