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


def test_decode_image_fails_soft_on_codec_formats(payloads):
    # fake-format payloads are not PPM and no decoder is injected:
    # every row must come back ok=false (never a stage failure)
    out = MM.decode_image(payloads).collect()
    assert out and all(r.ok is False for r in out)


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


def _gradient_ppm(w, h):
    rgb = bytes((x * 40 + c) % 256 for y in range(h) for x in range(w) for c in range(3))
    return MM.encode_ppm(w, h, rgb), rgb


def test_ppm_decodes_for_real(spark):
    blob, rgb = _gradient_ppm(4, 2)
    # comment lines in the header must parse too
    commented = blob.replace(b"P6\n", b"P6\n# a comment\n", 1)
    df = spark.createDataFrame(
        [(1, blob), (2, commented), (3, b"\xff\xd8jpeg-bytes"), (4, b"junk")],
        "content_id bigint, content binary",
    )
    out = {r.content_id: r for r in MM.decode_image(df).collect()}
    assert (out[1].width, out[1].height, bytes(out[1].pixels)) == (4, 2, rgb)
    assert bytes(out[2].pixels) == rgb  # comment skipped
    # codec formats without an injected decoder fail soft, not the stage
    assert out[3].ok is False and out[3].pixels is None
    assert out[4].ok is False


def test_ppm_nearest_neighbor_resize_picks_exact_source_pixels(spark):
    blob, rgb = _gradient_ppm(4, 2)
    df = spark.createDataFrame([(1, blob)], "content_id bigint, content binary")
    out = MM.resize_image(df, 2, 1).collect()[0]
    w, h, px = MM.decode_ppm(bytes(out.content))
    assert (w, h) == (2, 1)
    # nearest-neighbor with integer mapping selects source pixels (0,0) and (0,2)
    src = [rgb[0:3], rgb[6:9]]
    assert px == b"".join(src)


def test_injected_decoder_handles_codec_formats(spark):
    df = spark.createDataFrame(
        [(1, b"\xff\xd8fake-jpeg")], "content_id bigint, content binary"
    )

    def fake_jpeg_decoder(b):
        return (2, 1, b"\x01\x02\x03\x04\x05\x06")

    out = MM.decode_image(df, decoder=fake_jpeg_decoder).collect()[0]
    assert out.ok is True and (out.width, out.height) == (2, 1)
    assert bytes(out.pixels) == b"\x01\x02\x03\x04\x05\x06"


def test_wav_decodes_for_real_and_features_are_exact(spark):
    import numpy as np

    rate = 8000
    t = np.arange(rate)  # 1 second
    sine = (np.sin(2 * np.pi * 440 * t / rate) * 10000).astype("<i2")
    stereo = np.stack([sine, np.zeros_like(sine)], axis=1)
    df = spark.createDataFrame(
        [
            (1, MM.encode_wav(rate, sine)),
            (2, MM.encode_wav(rate, stereo)),
            (3, b"RIFFxxxxWAVE"),          # truncated chunk table
            (4, b"not audio at all"),
        ],
        "content_id bigint, content binary",
    )
    out = {r.content_id: r for r in MM.extract_audio_features(df).collect()}
    assert (out[1].sample_rate, out[1].n_channels, out[1].n_samples) == (rate, 1, rate)
    assert abs(out[1].duration_s - 1.0) < 1e-9
    # 440 Hz sine crosses zero ~880 times per second
    assert 850 <= out[1].zero_crossings <= 910
    expected_rms = float(np.sqrt(np.mean(sine.astype(np.float64) ** 2)))
    assert abs(out[1].rms - expected_rms) < 1e-6
    assert out[2].n_channels == 2 and out[2].n_samples == rate
    assert out[3].ok is False and out[4].ok is False


def test_wav_roundtrip(spark):
    import numpy as np

    samples = np.array([[0, 1], [-2, 3], [32767, -32768]], dtype="<i2")
    rate, nch, back = MM.decode_wav(MM.encode_wav(44100, samples))
    assert (rate, nch) == (44100, 2)
    assert (back == samples).all()
