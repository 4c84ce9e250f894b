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
