"""Arithmetic-coded JPEG gates (T.81 Annex D QM-coder + Annex F
sequential models) — the r8 tier that closed the last injected-codec
gap.

Cross-validation strategy, strongest first:
1. FOREIGN DECODE: a byte-pinned libjpeg-produced arithmetic stream
   (quality 95, 4:2:0, restart_interval=2 — every feature the decoder
   claims) must decode within the documented ±2 IDCT-variant envelope
   of libjpeg's own plain-upsampling output (pinned), with our exact
   buffer sha pinned on top.
2. ENTROPY-LAYER ISOLATION: libjpeg twins of one image (quality 50,
   4:4:4, restart 3 — the extreme-ringing case where the IDCT envelope
   widens) encoded Huffman vs arithmetic carry IDENTICAL coefficients,
   so our decoder must produce BIT-IDENTICAL buffers for both — any
   QM-register or statistical-model defect desynchronizes immediately.
3. FOREIGN ENCODE: our encoder's byte-pinned stream was decoded by
   libjpeg at fixture-generation time (scripts/jpeg_arith_tool.c); the
   reference pixels are pinned and must stay within the ±2 envelope of
   our own decode, proving the stream is standard JPEG, not merely
   self-consistent.
4. Baseline/progressive/arithmetic encoders share quantized
   coefficients, so all three roundtrips are bit-identical.
"""

from __future__ import annotations

import base64
import hashlib
import random

import numpy as np

from azurestorage_blueprints_spark.operators.multimodal import (
    _JPEG_ARITAB,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_arith,
    encode_jpeg_progressive,
)

_AFIX_W, _AFIX_H = 24, 17
_OURS_W, _OURS_H = 16, 16

_AFIX_JPEG = base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAIBAQEBAQIBAQECAgICAgQDAgICAgUEBAMEBgUGBgYF"
    "BgYGBwkIBgcJBwYGCAsICQoKCgoKBggLDAsKDAkKCgr/2wBDAQICAgICAgUDAwUKBwYHCgoKCgoK"
    "CgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgr/yQARCAARABgDASIA"
    "AhEBAxEB/8wACgAQEAUBEBEF/90ABAAC/9oADAMBAAIRAxEAPwD/ACVK1hG0JS03Kqy3rvK4uAnH"
    "zor8I3YY0sRhsiJpP4BKv4VZeOu0RgLQIjqfLtN4okLVCXAgfm3cl9Q7NzLk7vDeMFd79oNl+zzR"
    "ajdV++rNpaQ/0TWIEggzASGN8+JgamzqbmEG9Vn2j3LEk+uzfpVvOKIne3/gJ2UqIVptWqlmAy0/"
    "Wk3yXw4IukDqqDroRPyBGXbzpTc30fHJKl4KfM4MAhRDYoVMunf/AIkE2/WiD1hgJ2sUoEL0AJmN"
    "l/P280j2Bo3L/L6vYk4XQsAW0xAFDdBlzcUstJm6DIRGlvzi4mjlANXj5C/+/jzVnXHQeoQXPO3D"
    "65VfX9J3hx/dDERHEGnwcwMs1Mf4G1H7miEixbYsP/A018zp25vFTONKQHsoDei+XbT+F06qhH4c"
    "jlBSZY9SEueOZtJecxEDiU65m1PCYiOu7n5decytdBMbQdbGoLIsz7EGRjU/fPB74KEIfIq6+b6E"
    "EYKE/i0th9qh7vGtlB8uSeQSNXOVyeVP9KxD5v2OkG1Qpi4xxVz3whS8P1Z/3HEhPK8S2a7YtrGl"
    "QyaMpf3GrSFn/wBsXO6rwnfUoX9ulZCKi3XEcHs/QQPzLxXqjbXbQOgpDai7KAoP/HUi3bRbmnWr"
    "XN2H7fhzDT7hr1Nut3GcYv/Q/wA+PAt2fUN3sdh8a1V6R8NcLnXX/wBba28vPJfi9ypUeWyHCUhd"
    "p49UirD6p0igwFBDgfSI9BrpcOuHSNvG8G0rzYomgWq33afZ+o5+ueBTIP/Z"
)
_AFIX_REF = base64.b64decode(
    "OyMZgmpgQD9hDQwuWHtBl7qAcLNWicxvcWVNX1M7plhYu21tpW+Gnmh/PyZEjnWThjeI96j5fbN5"
    "U4lPTYZdp+C3en6hODxfoYl/nYV72tn7a2qMeZxipsmPi85xC04ApZmB1cmxZRcXzoCA2KK5dT9W"
    "W0Jgb1Z0WAlahTaHg7l/M2kvf7iPMGlAfICjaW2Q/6XXt1GDPk1KTVxZAC0AGUcZdEhj5LjTmcCr"
    "tNvGWC565bv/SnIah69XJo4/bNSFi4tnmJh0YWxKKTQSsaXnoJTWLF2IW4y39pDCxmCSaHd0Xm1q"
    "hLKEE0ETSBw3i196G0ItdJuGm3G9jGKulLxkfKRMG4M0QKhZqamFsLCMXmlHZXBOTUGDg3e5YJG8"
    "FUZxoJpcfHY4vU1mmChBSixEjnCIOx5uZUiYo1pl6qGsf0d2cjpp2a7KfFFtlzapsVDDsJh2TTUT"
    "or2cYn1cl7hdW3whTzYyzLOviIJEc20vmChB/5myq42ltJauy67+b1KisGdyhTxHp2+e+8Pyu5Cs"
    "XjNPjy6htlXIOCAAy7ORvNe21/LRRGUKiqtQvaSgeWBcgNKhq/3M57SfqHVg4IWopUptpm28cDeG"
    "UYCGOWhu18jD08S/btOxTLGPbJBTttqdnLEY3PFYj9aKg8p+QqJbXLx1qGiL1JS3hdemgtSjuYZx"
    "dEEsuF2AVwAfUBdmhEuaTHuBfq2zYFFMMiMee+C+GX5cQGQnud2gdIkA2/BXn+aaf8Z6l/ewasqD"
    "eTlc0pK1uaw8zcBQk5zFk5zFMzZjY2aTz6St7cLLhWl1qo6a3Nfbu7a6qK6Kc3lVmXh/d1Zds6PH"
    "YVF1qZOWSDI1XCQ9lV12EB5p4e//gnUF1chYkpvEGSJLc3ajWVyJyJ2m1qu0VjpGgWVxT0pOOjU5"
    "mJ56oqiEnHuCf15lhHSYZVV5Z1FUW0VI3KS93KS9xtT/Hy14eIpQUGIoQz464NvXq7/YnrLLqbXL"
    "SVVr3ezFXm1Ge2jTbFnEdLelJ2pY/8qJqm0s37T/PhNsgWtdeWNVpahzwsWQqsX/jKf2j6FnMkQK"
    "vLezaWRgfpKrs8fgy9ftbnqQnq2GzNu0iXbhPSqVbbCeJWhWpWgn2p1cek+oyp/4PCYYhW9ham04"
    "i45ZCCNyW3bFwcXEp6uqgT1SzYmeNZCHheDXT7bhAGOOjLKZp820qaDhbWSlmKW4fImcGDVHcI2f"
    "XXZMJT4U7ZqsnktdypSigEpYjpOXxcrObXFwQERD4JyxejZLdM/GcMvCJo24JIu2kbeeUnhfJh1e"
    "cWipV2R3ws/igZ6wwd7wcYpgyuO5ok9hl0RWj1lnk11rIicrUVZaTFpjhJKbMnUmRIc4ICYYdnxu"
    "YDBIXi5Gn1kU/9KNZ8S6OZaMJj8it9CzyeSvaINOIUxdlcDRydWtZHBImp28ztHwl1Ne4Jynd4WO"
    "Hiw1crVmO34vanBitryuvY2leEhgzIZB5J5ZRaKYGHVrcIlskKmMUGs2KUQPRG+Au+b3laF5SlYu"
    "RUhnc3aV/9Xgy4eSP6ryLpnhtBY3uBo7X5iJTIV2lEsA/8xulIu2Y1qFjZBhc3ZH7Lv/f06dVooc"
    "oNRmt1so/6p3rLGTj5R2NUAeo66MbTxCjl1j"
)
_AFIX_OUR_SHA = "5d5118b4b2a395a1cb51212198fdcf9adde8b09e86704c5769cb5385bde81091"
_TWIN_ARITH = base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDABALDA4MChAODQ4SERATGCgaGBYWGDEjJR0oOjM9PDkz"
    "ODdASFxOQERXRTc4UG1RV19iZ2hnPk1xeXBkeFxlZ2P/2wBDARESEhgVGC8aGi9jQjhCY2NjY2Nj"
    "Y2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2P/yQARCAARABgDAREA"
    "AhEBAxEB/8wACgAQEAUBEBEF/90ABAAD/9oADAMBAAIRAxEAPwD4dolkCcrbE6dUwV3O98IoR/xA"
    "uPXiFkegm89n7xC8No023yMichcid088ltnarWV0zyfbCRnnXy1IljIf0196RCbWYvMpXEMgLsB0"
    "hmhzZsRzpzOMxAhOQBWWt9vxpaBxeBwJKW1+H1zKdsm5gzjc0T+BXvEUG2Rx69qbipbbYIITG3Ex"
    "DKQA3X6xzKve7iewHqjuzLNUKAdTltoMBts8QhceE5oLmWkmHTkQ/9DByUsK1XQq0TQ92o7SnI3X"
    "2Xcq4ix+vuPD+3THsx67wS9cv6wYeKtaCibAvUtIz4o3IgHqtrDkatqaN8qX1ujzQn4gcIoYzSbI"
    "iBcVlQMajrGpPqPsoC3/ANvkc9Kwg65WRDXmPShtPJiCBnwJ4zL5mL53djvF3sbKycMruxetIITK"
    "C16ck/B98IH9w2kYAaTfCvmHriaWhTkHjKmv4fK3OU0BCPHS5d5fSQvV5Qm4/9H1/WnjHLgYK0Vy"
    "RDzgXTG9ea8DCslD3O4+Awzrs+xLuDUgGdzlWU/EWQl7KgO+psl6KW23mYU8/9k="
)
_TWIN_HUFF = base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDABALDA4MChAODQ4SERATGCgaGBYWGDEjJR0oOjM9PDkz"
    "ODdASFxOQERXRTc4UG1RV19iZ2hnPk1xeXBkeFxlZ2P/2wBDARESEhgVGC8aGi9jQjhCY2NjY2Nj"
    "Y2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2NjY2P/wAARCAARABgDAREA"
    "AhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQA"
    "AAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3"
    "ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWm"
    "p6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEA"
    "AwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSEx"
    "BhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElK"
    "U1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3"
    "uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/90ABAAD/9oADAMBAAIRAxEA"
    "PwCO5R7WdmVobfOF8vIyy9QuVGc9cHOePpSglVkoS6fPW/rfz2V+xo6aqe+vhen/AAU3bpurWWz6"
    "kjIJY1wkRZ5U+RW24OMZxngHbxzzkmny8rs3bRrvfXTeybT3JlO8IxU9e9r9Pw82/RaXJJLSVIUO"
    "cJKiqFYltg7Anoc56dOOowDWdKspT5uW7d9e2u/33ffTzM5Pnq2W9vs/nu103632uf/QdHcopklP"
    "mSSxoxjfByvOO2QMd+/8gUlGEfZvpo/Td9t9bX6eW8ylO943bv6L8fJ6LTs9xzgCV49+2EIGxM/y"
    "he+Dk4+9wOvHNKTg6UX+S1vr0vtZO72XqhpuM/e6br7tdmna2y89bWTjjjdJywjWSSVVkHdkUnOV"
    "yQRjr2x15xk3GTU3Pa19Pu3020Vt10utjRWnD3Zat7X+dn3fo1p3ukf/0WW//IVP/XeL+dLMN5+i"
    "NMN/Bo/9vFiHoP8Ar5T+b0qn8Kr6L8omcP4S9Y/lTItQ6Q/9e4/9CSsIbfN/+3HRV/3h/P8AU//Z"
)
_OURS_RGB = base64.b64decode(
    "4TsDLhEqMrV5CA8IsfftTC5dOgf5fyHuIy0XiiCa9rWIf2boCSQCqknywVUbJ/5TJm5JDbE4SJzo"
    "FNWNFFqLT5lP7RXFsv2u7/MX8Vfh4JeMP1/V3z00+MCCYrA3UIlPpeQkKMptGJITcCyinOshgyXa"
    "ZzPLY+t4uGnXWWiaHrRO//GqR0MYVEojplcAHyxLbxTdyKZqw4+b2KNNL4WO0syNOsCMbZjLGrLh"
    "d/tUwp0BJfXKmNv1X830UJC9sWlW6vIO7zUNu/MhR6mylJiplmOOJWitq6TqiCs9fYO+Rg7KExZq"
    "T6C13iOchfhwsioJqXVT9P9HIkp8VMmnQuQUviO80RYkoHRlscL8Gg/lKZbarkv4ew+2vtRZJgls"
    "ZEhDghnvub6Ty9C8d5IEoIg9Em+9XqSVuYta6VYB0Xpi44tZtdH49vXjvjTNQTbw+TFDg3okq8iW"
    "tc9g8u6j4jftKyZlWqtYwYtmhw9QoTMXHIXZpa6d3lXAygSUkaJ/T2Pn49Wsid7IhPyhfpJQU9JQ"
    "EXe1adzjDM8jICR9w/jCeZqn5yCbDVxJS8DbWkaaMPqrRIjc8Y6hVSHgdeJ/IohPjErJb2ZKbK/T"
    "ALFhcggJueF5BdTY/tepf/ic8AgKlT/nfcrWaxXcyDnTW1klvFd1IMIQQYkOsB6MCRfS9g+TXXb6"
    "H5Z85OpZhlLVnwSVpmleEJ3/CdlT3q2SMCjWqxPR4l3PNqlhM8otokAlqfaGJyDmBbQSbjfkWxWI"
    "zJ4QrK9sLHwymQgiKw6YsNwJyOksbyiyq7TGtTAPQkTmt0AxH4hREK38Kt64CdehYlR12Ffd/0fC"
    "88WcjYRJt0OFn3+XVU/pHYXWvBmyBBNlnGHzxpChxNSL5Byrg2OhMM66utqXx9GQg1bot2ZdH8Ho"
    "Q3nAm77SgnKn4qA/VIBaz+aFjeYuVOn7GB2abMJD0iRgTpS+lVzf8Bp79MgxURs6MUtCP/G9NQop"
    "aUWgwYPYlrjldSCgGGiZzb/8nINVXqIKFK+o"
)
_OURS_SHA = "d40828c7f884ae578089c72cb127719697edee536620fb81ab488d7d3e95ce82"
_OURS_LIBJPEG_REF = base64.b64decode(
    "4UYAFxFBTp+QAB4Axf//PyRzQAbwjhjcJB8Adk3R8qi1hWHdCyARllLn10pBLPxcIWZRAMApRIrf"
    "D+KfAFtWR5Zn7xjvnv+z//ER60zK4paYYl338EAR1dCMML8BTYI8tuc+J7t9M5wCaSigr/QDhyrT"
    "dDDRYeGAsHLfO1x/O80u9NedOEApg04msVciGzswUwPW5pdMt6Gkx8VWFGt8886+QaVpfaWnGKfz"
    "iP+DtacAHv+ljM7xZc//NompqGBr+f0Q8DknsuoBSaCxqYSveGtyJHPScLjgox9Zd4m5TgDmDg9r"
    "f6jIxyqVgPqB2Ssso4I16f9XJUtYZ7/AXO9HqCKR5Qcep3xsqM/2BxPHLpPXv1H/ThHOqu43Mw45"
    "W0AVahngw76q8cevaY0Rq3hlJGy0Qa++ynN88UkK0ZRo1oY/l+L//974yTPGRxH//0JYm3gmu7WT"
    "c+iA7/+C/jHkFy07QLpBz5JciQtSmC8sLIDGnrK741Wh7wB3f7ivOWbD7cK5kO/DX/yVfJZZctdN"
    "AHOnYen5DtklFzeCy/DObZGF3yq3HFZAR8LkY0WBL/yvRprG54+1ZxLpbs5qJ4NCqFnwTmdKk5DH"
    "GK01YwgAtdqKBebI/8Whh++63BgAoT79bt/NbwDHs1O1jmNcqkxcHskYSI4Jny58AxDr/wDRZXvq"
    "AJeh+tVRY3jjkACYknBkHIX/DuSCwqKJOhrFnyL80GXnZpJXHdIJlEgxiux7PCvrC7kAczfLThWi"
    "+otTqsJqNopOkQAKNhe9sNoA0OYfZCOZqbWnpDg2NVXM0jYfCpRJALXDNOjcG8uLZklf2EvN3kCx"
    "/9uaoWw2rFOBiW6zcUn/MIz5yBGrAAB+s1vt24OzuO6j1gqnnWOvFNOgz+ix5cOgZFXkqXxbM67a"
    "Pp9+rL3/SoZAzqpST51twtuim+RMQ+T2ACiUesNX4As7O5mln1nT5iOM38M0YBxnHU01UezEVwAh"
    "ekurvnG1mNHseA+FNWCDzcv8knxKXaAvHa6f"
)


def test_decode_foreign_libjpeg_arith_fixture_within_idct_envelope():
    w, h, px = decode_jpeg(_AFIX_JPEG)
    assert (w, h) == (_AFIX_W, _AFIX_H)
    ours = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
    ref = np.frombuffer(_AFIX_REF, dtype=np.uint8).astype(np.int64)
    assert ours.shape == ref.shape
    assert int(np.abs(ours - ref).max()) <= 2, "outside the IDCT-variant envelope"
    assert hashlib.sha256(px).hexdigest() == _AFIX_OUR_SHA


def test_arith_decode_bit_identical_to_huffman_twin():
    wa, ha, pa = decode_jpeg(_TWIN_ARITH)
    wh, hh, ph = decode_jpeg(_TWIN_HUFF)
    assert (wa, ha) == (wh, hh) == (24, 17)
    assert pa == ph, "entropy layers disagree on identical coefficients"


def test_our_arith_stream_is_standard_jpeg():
    blob = encode_jpeg_arith(_OURS_W, _OURS_H, _OURS_RGB)
    assert hashlib.sha256(blob).hexdigest() == _OURS_SHA, (
        "encoder output drifted — regenerate the libjpeg reference with "
        "scripts/jpeg_arith_tool.c before re-pinning"
    )
    w, h, px = decode_jpeg(blob)
    assert (w, h) == (_OURS_W, _OURS_H)
    ours = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
    ref = np.frombuffer(_OURS_LIBJPEG_REF, dtype=np.uint8).astype(np.int64)
    assert int(np.abs(ours - ref).max()) <= 2, (
        "libjpeg's decode of our stream left the IDCT envelope"
    )


def test_arith_roundtrip_bit_identical_to_baseline_and_progressive():
    rng = random.Random(7)
    for w, h in ((8, 8), (16, 16), (24, 17)):
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        pa = decode_jpeg(encode_jpeg_arith(w, h, rgb))
        pb = decode_jpeg(encode_jpeg(w, h, rgb))
        pp = decode_jpeg(encode_jpeg_progressive(w, h, rgb))
        assert pa == pb == pp, f"{w}x{h}: entropy layers disagree"


def test_aritab_state_machine_invariants():
    assert len(_JPEG_ARITAB) == 114
    for i, (qe, nlps, nmps, sw) in enumerate(_JPEG_ARITAB):
        assert 0 < qe <= 0x5B12
        assert 0 <= nlps <= 113 and 0 <= nmps <= 113
        assert sw in (0, 1)
    qe, nlps, nmps, sw = _JPEG_ARITAB[113]
    assert (qe, nlps, nmps, sw) == (0x5A1D, 113, 113, 0), "fixed 0.5 state"
    assert _JPEG_ARITAB[0] == (0x5A1D, 1, 1, 1)


def test_qm_coder_roundtrips_random_decision_sequences():
    """Property fuzz for the QM layer in isolation: any sequence of
    (context, decision) pairs encoded by _JpegArithEncoder must decode
    to the identical sequence through _JpegArithDecoder with identical
    adaptive state — covering renormalization cascades, conditional
    exchange on both paths, 0xFF stuffing, and the zero-feed tail far
    beyond what image fixtures exercise."""
    import random

    from azurestorage_blueprints_spark.operators.multimodal import (
        _JpegArithDecoder,
        _JpegArithEncoder,
    )

    rng = random.Random(20260815)
    for trial in range(40):
        n_ctx = rng.randrange(1, 8)
        n = rng.randrange(1, 400)
        # biased decision streams reach the deep (skewed-Qe) states;
        # uniform ones stress exchange/renorm churn
        bias = rng.choice([0.03, 0.2, 0.5, 0.8, 0.97])
        seq = [
            (rng.randrange(n_ctx), 1 if rng.random() < bias else 0)
            for _ in range(n)
        ]
        enc = _JpegArithEncoder()
        e_bank, e_mps = bytearray(n_ctx), bytearray(n_ctx)
        for ctx, d in seq:
            enc.code(e_bank, e_mps, ctx, d)
        body = enc.flush() + b"\xff\xd9"  # marker-terminated like a scan
        dec = _JpegArithDecoder(body, 0)
        d_bank, d_mps = bytearray(n_ctx), bytearray(n_ctx)
        got = [(ctx, dec.decode(d_bank, d_mps, ctx)) for ctx, _ in seq]
        assert got == seq, f"trial {trial}: decision stream diverged"
        assert bytes(d_bank) == bytes(e_bank) and bytes(d_mps) == bytes(e_mps), (
            f"trial {trial}: adaptive state diverged"
        )


def test_qm_encoder_drains_incrementally_on_long_streams():
    """The r9 incremental byte-out (r8 ADVICE: the unbounded-int
    accumulator was O(n^2) in entropy-stream length): a long decision
    stream must cross the drain threshold many times — live window
    pinned under _DRAIN_BITS, settled bytes in the drain buffer, carry
    ripples applied there — and still roundtrip decision-exact with
    identical adaptive state."""
    import random

    from azurestorage_blueprints_spark.operators.multimodal import (
        _JpegArithDecoder,
        _JpegArithEncoder,
    )

    rng = random.Random(7)
    n_ctx = 4
    # alternating bias segments force dense renorm churn AND long MPS
    # runs (the carry-heavy regime where += temp ripples far)
    seq = []
    for seg in range(20):
        bias = 0.97 if seg % 2 == 0 else 0.35
        seq += [
            (rng.randrange(n_ctx), 1 if rng.random() < bias else 0)
            for _ in range(1500)
        ]
    enc = _JpegArithEncoder()
    e_bank, e_mps = bytearray(n_ctx), bytearray(n_ctx)
    for ctx, d in seq:
        enc.code(e_bank, e_mps, ctx, d)
        assert enc._width < enc._DRAIN_BITS + 16, "live window not drained"
    assert len(enc._buf) > 0, "stream too short to exercise the drain path"
    body = enc.flush() + b"\xff\xd9"
    dec = _JpegArithDecoder(body, 0)
    d_bank, d_mps = bytearray(n_ctx), bytearray(n_ctx)
    got = [(ctx, dec.decode(d_bank, d_mps, ctx)) for ctx, _ in seq]
    assert got == seq, "long-stream decision roundtrip diverged"
    assert bytes(d_bank) == bytes(e_bank) and bytes(d_mps) == bytes(e_mps)
