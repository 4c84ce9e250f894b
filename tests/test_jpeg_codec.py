"""Baseline JPEG codec gates — the rows-only correctness tier for the
hand-rolled Huffman+IDCT decoder (operators/multimodal.py decode_jpeg)
and its fixture encoder.

The strongest check is foreign-encoder parsing: a byte-pinned fixture
produced by libjpeg (quality 85, 4:2:0 subsampling, restart interval 2
— every feature the decoder claims) must decode within ±2/pixel of
libjpeg's own plain-upsampling output (also pinned), and the exact
sha256 of our decoded buffer is pinned so ANY arithmetic drift in the
IDCT/upsample/color path fails loudly. The ±2 envelope is the
documented IDCT-variant gap (libjpeg integer islow vs our exact
float64), measured across qualities, subsampling modes, and restart
intervals at build time.
"""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pytest

from azurestorage_blueprints_spark.operators.multimodal import (
    decode_jpeg,
    encode_jpeg,
)

# libjpeg-produced fixture: 24x17 RGB pattern, quality 85, default
# 4:2:0 sampling, restart_interval=2 (see module docstring)
_FIX_W, _FIX_H = 24, 17
_FIX_JPEG = base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAUDBAQEAwUEBAQFBQUGBwwIBwcHBw8LCwkMEQ8SEhEP"
    "ERETFhwXExQaFRERGCEYGh0dHx8fExciJCIeJBweHx7/2wBDAQUFBQcGBw4ICA4eFBEUHh4eHh4e"
    "Hh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh7/wAARCAARABgDASIA"
    "AhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQA"
    "AAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3"
    "ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWm"
    "p6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEA"
    "AwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSEx"
    "BhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElK"
    "U1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3"
    "uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/90ABAAC/9oADAMBAAIRAxEA"
    "PwD590nwl9391+ldfpPhLp+6/SvUdJ8JdP3X6V1+k+Eun7r9K+anmnmeVwxxpt7x5dpPhLp+6/Si"
    "vf8ASfCX3f3X6UVzPNNdz90y3jT9wveP/9D0bSe1ddpHaiivzOZ+E8MfZOv0ntRRRXOz91y3+Aj/"
    "2Q=="
)
_FIX_REF = base64.b64decode(
    "AAAAAwMBEgIDFgYHKAAJLAQNQAAQRAQUVgEWWQQZbgAbcQMehQAgiQMkmAIomgQqrgEusQQxwwEz"
    "xwU32wA43wQ88QE+9ARBCQkHDQ0LHAwNIBARMgoTNg4XSwsbTg4eYAsgYw4jeAolfA4pjwkqkw0u"
    "ogwypQ81uQw5uw47zQs90Q9B5gtD6g9H+wtI/g5LAh4IBiIMFiEQGSQTLB8WLyIZRR8cSCIfWh8h"
    "XSIkcR4mdSIqiB4sjCIwmyAyniM1syE4tiQ7xyA+yyRC4R9C5SNG9SFJ9yNLDCgSDysVHyoZIi0c"
    "NSgfOCsiTiglUSsoZCkrZisteicvfiszkig2lSs5pCk7pyw+vCpBvy1E0SpI1C1L6ihL7ixP/ipS"
    "/yxUAD8QBEMUEkMWFkcaKEAcLEQgQEEiREUmV0EpWkQsbkEuckUyhT8ziUM3l0I7mkU+r0NBsUVD"
    "w0JGx0ZK3UFM4ERP8UJR9EVUCUgZDUwdG0wfH1AjMkomNU0pSkssTU4vYEoyY001d0o3e047jkg8"
    "kkxAoEtEo05HuExKuk5MzEtP0E9T5kpV6k5Z+kta/U5dAF8aAmMeEmMhFWYkJ2EmKmQpQGEsQ2Qv"
    "VmIyWGQ0bWA2cWQ6g189h2NBl2JDmmVGrmJKsWVNwmFQxmVU22FU32VY8WJa82RcCWolDG0oHG0r"
    "H3AuMWswNG4zSms2Tm86YGw8Ym4+d2pAe25EjmpIkm5MoWxNpG9QuGxUu29XzWxb0XBf5Wte6W9i"
    "+2xk/m9nA38nBYEpE4AtF4QxLIAzMIQ3Qn85RYI8WYA/XINCcH9Ec4JHiH5LjIJPm4BRnYJTr4BW"
    "s4RaxYFcyYVg3X5g4YJk8oBm9oRqDYkxEIw0Hos4IY47Noo9Oo5BTYpET4xGY4pJZo1MeolOfo1S"
    "kohVloxZpYpbqI1euYpgvY5k0Ixn049q6Ilr64xu/Ytx/450AqAyBaM1FKE5F6Q8KqA/LqRDQ6BF"
    "RaJHWqBKXaNNcJ9PdKNTh59Vi6NZmqFdnaRgr59hs6NlxqJoyaVr3p9s4aJv86Fy9qR1C6k7Dqw+"
    "HapCIa5GM6lIN61MTKlOT6xRZKpUZqxWeahYfaxckalflKxio6pmpq1pualrvKxuz6tx0q5056h1"
    "6qt4/Kp7/65/AME6AsQ9D8JAE8ZEKMJGLMZKP8NMQcVOVsJSWcVVbMJXcMZbhMBciMRglsNkmcZn"
    "q8Jor8ZswcNvxcdz2sBz3sR378N68sZ9CMpDC81GGcxKHM9NMctPNc9TSMxVSs5XX8tbYs5edctg"
    "ec9kjcllkc1pn8xtos9wtMtxuM91y815ztB85Mp9582A+MyD+8+GAt9EBeJHFOBLGORPKuBQLuRU"
    "QuBXROJZWeFdW+Nfb99hc+Nlht5miuJqmuBuneNxsOBzs+N2xeF6yOR93d9+4OKB8eCE9OOHDOlO"
    "D+xRHupVIu5ZNOpaOO5eTOphT+1kY+tnZe1peelrfe1vkelxle11pOp4p+17uup9ve2Az+uE0u6H"
    "5+mI6uyL++qO/+6SA/9QBf9SGP5WHP9aM/1cNv9fSP1iS/9lWv9nXf9qcP5sdP9wivxxjv91oP15"
    "o/98tv5+uP+AyP6EzP+I4v2M5f+P9/2T+v+W"
)
_FIX_OUR_SHA = "4ee57f89f12309a7cdca1c8425bdc62849bbfee2bade95b225f5548dbbc9307a"


def test_decode_foreign_libjpeg_fixture_within_idct_envelope():
    w, h, px = decode_jpeg(_FIX_JPEG)
    assert (w, h) == (_FIX_W, _FIX_H)
    ours = np.frombuffer(px, dtype=np.uint8).astype(int)
    ref = np.frombuffer(_FIX_REF, dtype=np.uint8).astype(int)
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).max() <= 2, "drifted beyond the IDCT-variant envelope"
    # exact arithmetic pin: IDCT, upsample, and color convert are
    # deterministic float64 — any change to them must be deliberate
    assert hashlib.sha256(px).hexdigest() == _FIX_OUR_SHA


def test_encode_decode_roundtrip_quality_and_determinism():
    h, w = 24, 32
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [(xx * 255 // (w - 1)), (yy * 255 // (h - 1)), ((xx + yy) * 255 // (w + h - 2))],
        axis=2,
    ).astype(np.uint8)
    jp = encode_jpeg(w, h, rgb.tobytes())
    assert jp[:2] == b"\xff\xd8" and jp[-2:] == b"\xff\xd9"
    w2, h2, px = decode_jpeg(jp)
    assert (w2, h2) == (w, h)
    out = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(int)
    err = np.abs(out - rgb.astype(int))
    # smooth gradient at quality 75: small bounded loss, no block tears
    assert err.max() <= 12 and err.mean() <= 3.0
    # flat field must survive exactly (DC-only blocks)
    flat = np.full((16, 16, 3), 120, dtype=np.uint8)
    _, _, fpx = decode_jpeg(encode_jpeg(16, 16, flat.tobytes()))
    assert np.abs(np.frombuffer(fpx, np.uint8).astype(int) - 120).max() == 0
    # byte-level determinism (the rows-only contract)
    assert encode_jpeg(w, h, rgb.tobytes()) == jp
    assert decode_jpeg(jp) == (w2, h2, px)


def test_fill_bytes_before_markers_are_skipped():
    # T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    # bytes; some encoders pad. Inject fill runs before header markers
    # and the decode must be byte-identical to the unpadded stream.
    ref = decode_jpeg(_FIX_JPEG)
    padded = bytearray(_FIX_JPEG[:2])
    i = 2
    for marker in (b"\xff\xdb", b"\xff\xc4", b"\xff\xda"):
        j = _FIX_JPEG.find(marker, i)
        assert j > 0
        padded += _FIX_JPEG[i:j] + b"\xff" * 3 + marker[1:]
        i = j + 2
    padded += _FIX_JPEG[i:]
    assert decode_jpeg(bytes(padded)) == ref


def test_mislabeled_progressive_stream_raises_not_misdecodes():
    # a BASELINE stream with its SOF0 flipped to SOF2 is invalid
    # progressive (its single scan claims Ss=0,Se=63 interleaved, which
    # Annex G forbids) — must raise, never silently mis-decode
    bad = bytearray(_FIX_JPEG)
    i = bad.find(b"\xff\xc0")
    assert i > 0
    bad[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 255 // (w - 1)), (yy * 255 // (h - 1)), ((xx + yy) * 255 // (w + h - 2))],
        axis=2,
    ).astype(np.uint8)


def test_progressive_roundtrip_matches_baseline_bit_exactly():
    """The progressive scan script (DC Al=1, split-spectral AC first
    passes, DC+AC refinements) accumulates EXACTLY the quantized
    coefficients the baseline encoder emits, so the decoded pixels
    must be bit-identical to the baseline decode — any defect in EOB
    runs, ZRL-over-history, correction bits, or point transforms
    breaks equality."""
    from azurestorage_blueprints_spark.operators.multimodal import (
        encode_jpeg_progressive,
    )

    for rgb in (
        _gradient(24, 32),
        np.random.RandomState(7).randint(0, 256, (16, 24, 3)).astype(np.uint8),
        np.full((13, 19, 3), 120, dtype=np.uint8),  # non-multiple-of-8 dims
    ):
        h, w = rgb.shape[:2]
        jp = encode_jpeg_progressive(w, h, rgb.tobytes())
        assert jp[:2] == b"\xff\xd8" and b"\xff\xc2" in jp[:200]
        assert decode_jpeg(jp) == decode_jpeg(encode_jpeg(w, h, rgb.tobytes()))
        # byte determinism (the rows-only contract)
        assert encode_jpeg_progressive(w, h, rgb.tobytes()) == jp


def test_progressive_dispatches_without_injected_decoder(spark):
    from azurestorage_blueprints_spark.operators import multimodal as MM

    rgb = _gradient(8, 8)
    jp = MM.encode_jpeg_progressive(8, 8, rgb.tobytes())
    df = spark.createDataFrame([(1, bytearray(jp))], "content_id long, content binary")
    row = MM.decode_image(df).collect()[0]
    assert row["ok"] and (row["width"], row["height"]) == (8, 8)
    assert len(bytes(row["pixels"])) == 8 * 8 * 3


def test_decode_image_dispatch_handles_jpeg(spark):
    from azurestorage_blueprints_spark.operators import multimodal as MM

    df = spark.createDataFrame([(1, bytearray(_FIX_JPEG))], "content_id long, content binary")
    rows = MM.decode_image(df).collect()
    assert len(rows) == 1 and rows[0].ok
    assert (rows[0].width, rows[0].height) == (_FIX_W, _FIX_H)
    assert hashlib.sha256(bytes(rows[0].pixels)).hexdigest() == _FIX_OUR_SHA


# libjpeg-produced 4:2:2 fixture (22x13, quality 85, h2v1 sampling) —
# backs the decoder's 4:2:2 claim alongside the 4:2:0+restart fixture
_F422_W, _F422_H = 22, 13
_F422_JPEG = base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAUDBAQEAwUEBAQFBQUGBwwIBwcHBw8LCwkMEQ8SEhEP"
    "ERETFhwXExQaFRERGCEYGh0dHx8fExciJCIeJBweHx7/2wBDAQUFBQcGBw4ICA4eFBEUHh4eHh4e"
    "Hh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh7/wAARCAANABYDASEA"
    "AhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQA"
    "AAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3"
    "ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWm"
    "p6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEA"
    "AwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSEx"
    "BhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElK"
    "U1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3"
    "uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwDxbRvA"
    "P3f3P6V22i+Afu/uf0qIVjt4W4k+HU7PS/AP7v8A1Pb0orpVY/csJxJ+5jqdvo3hmw+Xj9K7XRfD"
    "Nh8vH6V4kJs/hvhbNq3unZ6X4ZsPL6dvSiulTZ+5YTNq3sYn/9k="
)
_F422_OUR_SHA = "fd03fc34dfe62d6ad057de93e3b80765f740d82ef91f090c3c8654fa41e54a28"


def test_decode_foreign_422_fixture_pinned():
    w, h, px = decode_jpeg(_F422_JPEG)
    assert (w, h) == (_F422_W, _F422_H)
    assert hashlib.sha256(px).hexdigest() == _F422_OUR_SHA
