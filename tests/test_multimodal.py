"""Multimodal binary-column plumbing tests: schema, Arrow batch path,
deterministic fake decode, feature extraction shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azurestorage_blueprints_spark.operators import multimodal as MM


@pytest.fixture()
def payloads(spark):
    rows = [
        (1, MM.pack_fake_image(640, 480, b"\x01\x02\x03" * 100)),
        (2, MM.pack_fake_image(64, 64)),
        (3, b"not-an-image"),
        (4, None),
    ]
    return spark.createDataFrame(rows, "content_id bigint, content binary")


def test_attach_metadata_jvm_side(payloads):
    out = attach = MM.attach_metadata(payloads).select("content_id", "meta.*").collect()
    by_id = {r.content_id: r for r in out}
    assert by_id[1].n_bytes == 12 + 300
    assert by_id[1].magic == "FIMG"
    assert by_id[3].magic == "not-"
    assert len(by_id[2].md5) == 32


def test_decode_image_meta_fake_decoder(payloads):
    out = {r.content_id: r for r in MM.decode_image_meta(payloads).collect()}
    assert (out[1].width, out[1].height, out[1].ok) == (640, 480, True)
    assert (out[2].width, out[2].height) == (64, 64)
    assert out[3].ok is False and out[3].width is None
    assert out[4].ok is False and out[4].n_bytes == 0


def test_decode_image_is_stubbed(payloads):
    with pytest.raises(NotImplementedError):
        MM.decode_image(payloads)


def test_extract_features_shape_and_determinism(payloads):
    out = MM.extract_features(payloads, n_features=8).collect()
    by_id = {r.content_id: r.features for r in out}
    assert all(len(v) == 8 for v in by_id.values())
    assert by_id[4] == [0.0] * 8
    # L1-normalized histogram sums to ~1 for non-empty payloads
    assert abs(sum(by_id[1]) - 1.0) < 1e-9
    # deterministic: second run identical
    again = {r.content_id: r.features for r in MM.extract_features(payloads, n_features=8).collect()}
    assert again == by_id
