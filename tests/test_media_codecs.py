"""Real media codecs (X6): actual pixel/sample bytes through the same
Spark plumbing the oracle-checked x52/x53 queries use.

Payloads are synthesized in-test (PPM/PGM/BMP images, PCM WAV audio) so
every expected value is known in closed form; no image/audio libraries
involved on either side.
"""

from __future__ import annotations

import io
import struct
import wave

import pytest

from ua2sql_spark.functions.media import (
    decode_audio_real,
    decode_image_real,
    fake_decode_image,
    resize_dims,
    resize_image_real,
)


def ppm(width: int, height: int, rgb=(10, 20, 30), comment=False) -> bytes:
    head = b"P6\n" + (b"# synthetic\n" if comment else b"")
    return (
        head
        + f"{width} {height}\n255\n".encode()
        + bytes(rgb) * (width * height)
    )


def pgm(width: int, height: int, value: int) -> bytes:
    return f"P5\n{width} {height}\n255\n".encode() + bytes([value]) * (
        width * height
    )


def bmp24(width: int, height: int, bgr=(30, 20, 10)) -> bytes:
    stride = (width * 3 + 3) & ~3
    pixel_bytes = (bytes(bgr) * width + b"\x00" * (stride - width * 3)) * height
    header = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(pixel_bytes), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pixel_bytes), 2835, 2835, 0, 0)
    )
    return header + pixel_bytes


def wav16(n: int, rate: int = 8000, amp: int = 1000, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{n * channels}h", *([amp] * n * channels)))
    return buf.getvalue()


def test_ppm_decode_exact():
    d = decode_image_real(ppm(8, 4, rgb=(10, 20, 30), comment=True))
    assert (d["width"], d["height"]) == (8, 4)
    assert d["mean_pixel"] == pytest.approx(20 / 255.0)  # mean(10,20,30)=20


def test_pgm_decode_exact():
    d = decode_image_real(pgm(5, 3, value=51))
    assert (d["width"], d["height"]) == (5, 3)
    assert d["mean_pixel"] == pytest.approx(0.2)


def test_bmp_decode_strips_row_padding():
    # width 3 → 9 data bytes padded to 12 per row; mean must exclude pads
    d = decode_image_real(bmp24(3, 2, bgr=(30, 20, 10)))
    assert (d["width"], d["height"]) == (3, 2)
    assert d["mean_pixel"] == pytest.approx(20 / 255.0)


def test_compressed_image_still_raises():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG\r\n\x1a\n....")


def test_wav_decode_exact():
    d = decode_audio_real(wav16(800, rate=8000, amp=1000, channels=2))
    assert d["channels"] == 2 and d["sample_rate"] == 8000
    assert d["n_samples"] == 800
    assert d["duration_s"] == pytest.approx(0.1)
    assert d["rms"] == pytest.approx(1000.0)  # constant amplitude


def test_non_wav_raises():
    with pytest.raises(NotImplementedError):
        decode_audio_real(b"ID3\x03not audio at all")


def test_resize_image_real_pixels():
    src = ppm(8, 4, rgb=(10, 20, 30))
    out = resize_image_real(src, target_long_side=4)
    d = decode_image_real(out)
    assert (d["width"], d["height"]) == resize_dims(8, 4, 4) == (4, 2)
    assert d["mean_pixel"] == pytest.approx(20 / 255.0)  # uniform image
    assert resize_image_real(src, target_long_side=100) == src  # no upscale


def test_real_bytes_through_mapinpandas(spark):
    """The x53 decode plumbing with REAL codecs: binary payloads in a
    DataFrame, Arrow-batched mapInPandas, exact pixel stats out."""
    from ua2sql_spark.queries.multimodal import decode_images

    payloads = [
        (1, ppm(8, 4, rgb=(10, 20, 30))),
        (2, pgm(5, 3, value=51)),
        (3, bmp24(3, 2, bgr=(30, 20, 10))),
    ]
    df = spark.createDataFrame(payloads, "doc_id bigint, payload binary")
    got = {r["doc_id"]: r for r in decode_images(df).collect()}
    assert (got[1]["width"], got[1]["height"]) == (8, 4)
    assert got[1]["mean_pixel"] == pytest.approx(20 / 255.0)
    assert (got[2]["width"], got[2]["height"]) == (5, 3)
    assert got[2]["mean_pixel"] == pytest.approx(0.2)
    assert (got[3]["width"], got[3]["height"]) == (3, 2)
    assert got[3]["mean_pixel"] == pytest.approx(20 / 255.0)


def test_fake_and_real_share_schema(spark):
    """Seam contract: swapping codec tiers changes values, never the
    schema or plan shape."""
    from ua2sql_spark.queries.multimodal import decode_images

    df = spark.createDataFrame(
        [(1, ppm(4, 4))], "doc_id bigint, payload binary"
    )
    real = decode_images(df)
    fake = decode_images(df, decoder=fake_decode_image)
    assert real.schema == fake.schema
    assert real.schema.simpleString() == (
        "struct<doc_id:bigint,width:int,height:int,mean_pixel:double>"
    )
