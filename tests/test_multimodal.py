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


def test_resize_rewrites_header_and_scales_payload(payloads, spark):
    out = {r.content_id: r for r in MM.resize_image(payloads, 320, 240).collect()}
    r1 = out[1]
    assert (r1.width, r1.height) == (320, 240)
    magic, w, h = MM._fake_decoder(bytes(r1.content))
    assert (magic, w, h) == ("FIMG", 320, 240)
    # downscale (640x480 -> 320x240 = 1/4 area) shrinks the payload
    assert len(r1.content) < 12 + 300
    # non-images fail soft: null content, null dims
    assert out[3].content is None and out[3].width is None


def test_sample_frames_explodes_every_kth(spark):
    vids = spark.createDataFrame(
        [
            (1, MM.pack_fake_video([b"frame-%d" % i for i in range(6)])),
            (2, MM.pack_fake_video([b"only-one"])),
            (3, b"not-a-video"),
        ],
        "content_id bigint, content binary",
    )
    rows = MM.sample_frames(vids, every_k=2).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.content_id, []).append((r.frame_idx, bytes(r.frame)))
    assert sorted(i for i, _ in by_vid[1]) == [0, 2, 4]
    assert by_vid[1][0][1].startswith(b"frame-0")
    assert [i for i, _ in by_vid[2]] == [0]
    assert 3 not in by_vid  # invalid container contributes no frames
