"""Multimodal column operators: opaque binary payloads + typed metadata.

The reference's data model IS the multimodal model — a blob is opaque
bytes (``upload_file.py:183-184``); the engine generalizes it to a
``binary`` DataFrame column carrying image/audio/video payloads with a
typed metadata struct alongside. The Spark-side plumbing here — schema,
Arrow batch shape, ``mapInPandas`` signatures, partition sizing — is
real and tested; the codec calls themselves are stubbed because the
image/audio libraries are not in this environment:

- ``decode_image`` raises ``NotImplementedError`` unless a decoder
  callback is injected (production: Pillow/libvips inside the worker);
- ``fake_decode_meta`` is the deterministic stand-in used by tests:
  it parses a tiny fake header (magic + width + height) from the
  payload bytes, which exercises the exact same batch path.

Scale notes: payload columns ride Arrow between JVM and Python in
column batches — with ``binaryFile`` sources, set
``spark.sql.files.maxPartitionBytes`` so a partition of payloads fits
executor memory; feature outputs are fixed-size arrays, so downstream
joins/aggs never touch the heavy bytes again (project early, carry
``content_id`` only).
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fake 12-byte header: magic 'FIMG' + uint32 width + uint32 height (BE)
FAKE_MAGIC = b"FIMG"

META_SCHEMA = "content_id bigint, n_bytes int, magic string, width int, height int, ok boolean"
FEATURE_SCHEMA = "content_id bigint, features array<double>"


def pack_fake_image(width: int, height: int, payload: bytes = b"") -> bytes:
    """Build a deterministic fake image blob (used by tests/fixtures)."""
    return FAKE_MAGIC + struct.pack(">II", width, height) + payload


def attach_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap JVM-side metadata: size, checksum, magic bytes — no Python.

    This is the first pass a 100 TB multimodal pipeline runs: it needs
    no decode, so it stays entirely in whole-stage codegen.
    """
    c = F.col(content_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.length(c).alias("n_bytes"),
            F.md5(c).alias("md5"),
            F.substring(c, 1, 4).cast("string").alias("magic"),
        ),
    )


def decode_image_meta(
    df: DataFrame,
    *,
    id_col: str = "content_id",
    content_col: str = "content",
    decoder: Callable[[bytes], tuple[str, int, int]] | None = None,
) -> DataFrame:
    """Decode header metadata per payload via mapInPandas (Arrow batches).

    ``decoder(payload) -> (magic, width, height)``. Default decoder
    understands only the deterministic fake format; a production
    deployment injects a real codec (which then runs vectorized over
    Arrow batches inside each executor).
    """
    dec = decoder or _fake_decoder

    def worker(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for cid, payload in zip(pdf[id_col], pdf[content_col]):
                b = bytes(payload) if payload is not None else b""
                try:
                    magic, w, h = dec(b)
                    out.append((cid, len(b), magic, w, h, True))
                except Exception:
                    out.append((cid, len(b), None, None, None, False))
            yield pd.DataFrame(
                out, columns=["content_id", "n_bytes", "magic", "width", "height", "ok"]
            )

    return df.select(id_col, content_col).mapInPandas(worker, schema=META_SCHEMA)


def _fake_decoder(b: bytes) -> tuple[str, int, int]:
    if len(b) < 12 or b[:4] != FAKE_MAGIC:
        raise ValueError("not a fake image")
    w, h = struct.unpack(">II", b[4:12])
    return (FAKE_MAGIC.decode(), w, h)


def decode_image(df: DataFrame, **kwargs) -> DataFrame:
    """Full image decode → pixel tensors. STUB: requires an image codec
    library (Pillow / libvips) that is not available in this
    environment; the metadata/feature paths above are the tested
    plumbing."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this environment; "
        "inject a decoder via decode_image_meta(decoder=...) or use "
        "extract_features for the deterministic feature path"
    )


def extract_features(
    df: DataFrame,
    *,
    id_col: str = "content_id",
    content_col: str = "content",
    n_features: int = 8,
) -> DataFrame:
    """Deterministic per-payload feature vector via mapInPandas: byte
    histogram moments (a stand-in with the exact batch shape of a real
    embedding model: binary in → fixed-size float vector out)."""

    def worker(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, feats = [], []
            for cid, payload in zip(pdf[id_col], pdf[content_col]):
                b = np.frombuffer(bytes(payload or b""), dtype=np.uint8)
                if b.size == 0:
                    feats.append([0.0] * n_features)
                else:
                    # bucketed byte histogram, L1-normalized
                    hist, _ = np.histogram(b, bins=n_features, range=(0, 256))
                    feats.append((hist / max(b.size, 1)).tolist())
                ids.append(cid)
            yield pd.DataFrame({"content_id": ids, "features": feats})

    return df.select(id_col, content_col).mapInPandas(worker, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = "content_id bigint, content binary, width int, height int"
FRAME_SCHEMA = "content_id bigint, frame_idx int, frame binary"

#: fake video container: magic 'FVID' + uint32 frame count, then
#: fixed-size frames (each a fake image payload)
FAKE_VIDEO_MAGIC = b"FVID"
_FRAME_BYTES = 16


def pack_fake_video(frames: list[bytes]) -> bytes:
    """Deterministic fake video: frames padded/truncated to 16 bytes."""
    body = b"".join((f + b"\x00" * _FRAME_BYTES)[:_FRAME_BYTES] for f in frames)
    return FAKE_VIDEO_MAGIC + struct.pack(">I", len(frames)) + body


def resize_image(
    df: DataFrame,
    width: int,
    height: int,
    *,
    id_col: str = "content_id",
    content_col: str = "content",
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize payloads via mapInPandas. The default resizer understands
    only the deterministic fake format (rewrites the header, scales the
    payload length proportionally — same batch shape as a real codec);
    production injects Pillow/libvips as ``resizer``."""

    def _fake_resize(b: bytes, w: int, h: int) -> bytes:
        magic, ow, oh = _fake_decoder(b)
        payload = b[12:]
        scale = (w * h) / max(ow * oh, 1)
        n_out = int(len(payload) * min(scale, 1.0))
        return pack_fake_image(w, h, payload[:n_out])

    rz = resizer or _fake_resize

    def worker(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for cid, payload in zip(pdf[id_col], pdf[content_col]):
                try:
                    out.append((cid, rz(bytes(payload), width, height), width, height))
                except Exception:
                    out.append((cid, None, None, None))
            yield pd.DataFrame(
                out, columns=["content_id", "content", "width", "height"]
            )

    return df.select(id_col, content_col).mapInPandas(worker, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_k: int = 2,
    *,
    id_col: str = "content_id",
    content_col: str = "content",
) -> DataFrame:
    """Sample every k-th frame from fake-video payloads — the exploding
    mapInPandas shape (one input row → many output rows) a real
    video-frame extractor uses; frame decode itself would be the
    injected codec."""

    def worker(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for cid, payload in zip(pdf[id_col], pdf[content_col]):
                b = bytes(payload or b"")
                if len(b) < 8 or b[:4] != FAKE_VIDEO_MAGIC:
                    continue
                (n,) = struct.unpack(">I", b[4:8])
                body = b[8:]
                for i in range(0, n, every_k):
                    ids.append(cid)
                    idxs.append(i)
                    frames.append(body[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES])
            yield pd.DataFrame(
                {"content_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, content_col).mapInPandas(worker, schema=FRAME_SCHEMA)
