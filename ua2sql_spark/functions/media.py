"""Media codec seam (SURVEY §2.11 X6): the boundary between the engine's
Spark plumbing (schemas, Arrow batching, 1→N frame expansion,
partitioning) and the actual codecs.

Two codec tiers share every signature and output shape:

* ``decode_image_real`` / ``decode_audio_real`` / ``resize_image_real``
  — REAL pure-stdlib codecs for the uncompressed container formats
  (PPM/PGM binary, BMP 24/32-bpp, PCM WAV). No third-party libs; these
  decode actual pixel/sample bytes. Compressed formats (PNG/JPEG/MP3,
  video) still raise ``NotImplementedError`` naming the dependency —
  this container ships no PIL/opencv/ffmpeg.
* ``fake_*`` — deterministic stand-ins deriving outputs purely from
  payload length/content so the DuckDB oracle can replicate them in SQL;
  used by the oracle-checked queries (x52/x53/x83).

Swapping real for fake changes *values*, never plans, schemas, or batch
shapes — which is exactly the part a Spark engine owns. The real tier is
exercised end-to-end (real bytes through the same ``mapInPandas``
plumbing) in tests/test_media_codecs.py.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

FRAME_SIZE = 100  # fake codec: 1 "frame" per 100 payload bytes
FRAME_STRIDE = 10  # sample every 10th frame


# ---------------------------------------------------------------------------
# Real image decode: PPM/PGM (netpbm binary) + BMP (uncompressed).
# ---------------------------------------------------------------------------
def _parse_pnm(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """Parse a binary netpbm header (P5 grayscale / P6 RGB). Returns
    (width, height, maxval, channels, raster). Handles '#' comments and
    arbitrary whitespace, per the netpbm spec."""
    magic = payload[:2]
    channels = {b"P5": 1, b"P6": 3}[magic]
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte before the raster
    width, height, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm samples not supported")
    raster = payload[pos : pos + width * height * channels]
    return width, height, maxval, channels, raster


def _parse_bmp(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse an uncompressed 24/32-bpp BMP. Returns (width, height,
    bytes_per_px, rows) with rows in raster order, padding stripped."""
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression}: only uncompressed "
            "24/32-bpp supported without an image library"
        )
    height = abs(height)  # negative height = top-down row order
    bytes_px = bpp // 8
    stride = (width * bytes_px + 3) & ~3  # rows pad to 4 bytes
    rows = [
        payload[data_offset + r * stride : data_offset + r * stride + width * bytes_px]
        for r in range(height)
    ]
    return width, height, bytes_px, rows


def decode_image_real(payload: bytes) -> dict:
    """Decode an image payload to (width, height, mean_pixel).

    Real pure-stdlib decode for PPM/PGM (binary netpbm) and
    uncompressed 24/32-bpp BMP; ``mean_pixel`` is the mean of all
    channel samples normalized to [0, 1]. Compressed formats raise."""
    magic = payload[:2]
    if magic in (b"P5", b"P6"):
        width, height, maxval, _, raster = _parse_pnm(payload)
        mean = (sum(raster) / len(raster) / maxval) if raster else 0.0
        return {"width": width, "height": height, "mean_pixel": mean}
    if magic == b"BM":
        width, height, _, rows = _parse_bmp(payload)
        n = sum(len(r) for r in rows)
        mean = (sum(sum(r) for r in rows) / n / 255.0) if n else 0.0
        return {"width": width, "height": height, "mean_pixel": mean}
    raise NotImplementedError(
        f"image magic {magic!r}: compressed formats (PNG/JPEG/…) need "
        "PIL/opencv, not in this container; PPM/PGM/BMP decode natively"
    )


def fake_decode_image(payload: bytes) -> dict:
    nbytes = len(payload)
    return {
        "width": nbytes % 640,
        "height": nbytes % 480,
        "mean_pixel": (nbytes * 37 % 256) / 255.0,
    }


# ---------------------------------------------------------------------------
# Real audio decode: PCM WAV via the stdlib wave module.
# ---------------------------------------------------------------------------
def decode_audio_real(payload: bytes) -> dict:
    """Decode a PCM WAV payload to (channels, sample_rate, n_samples,
    duration_s, rms). 16-bit PCM only (the overwhelmingly common case);
    compressed audio raises."""
    try:
        with wave.open(io.BytesIO(payload)) as w:
            if w.getsampwidth() != 2 or w.getcomptype() != "NONE":
                raise NotImplementedError(
                    "only 16-bit PCM WAV decodes natively; compressed "
                    "audio needs ffmpeg/soundfile"
                )
            channels, rate = w.getnchannels(), w.getframerate()
            n = w.getnframes()
            frames = w.readframes(n)
    except wave.Error as exc:
        raise NotImplementedError(f"not a PCM WAV payload: {exc}") from exc
    samples = struct.unpack(f"<{len(frames) // 2}h", frames)
    rms = (sum(s * s for s in samples) / len(samples)) ** 0.5 if samples else 0.0
    return {
        "channels": channels,
        "sample_rate": rate,
        "n_samples": n,
        "duration_s": n / rate if rate else 0.0,
        "rms": rms,
    }


def resize_image_real(payload: bytes, target_long_side: int) -> bytes:
    """Real aspect-preserving nearest-neighbour downscale of a binary
    netpbm payload (P5/P6); returns a new netpbm payload. Never
    upscales. Dimension arithmetic is `resize_dims` — shared with the
    metadata-only path."""
    width, height, maxval, channels, raster = _parse_pnm(payload)
    new_w, new_h = resize_dims(width, height, target_long_side)
    if (new_w, new_h) == (width, height):
        return payload
    out = bytearray()
    for y in range(new_h):
        sy = y * height // new_h
        for x in range(new_w):
            sx = x * width // new_w
            off = (sy * width + sx) * channels
            out += raster[off : off + channels]
    magic = payload[:2].decode()
    return f"{magic}\n{new_w} {new_h}\n{maxval}\n".encode() + bytes(out)


def resize_real(width: int, height: int, target_long_side: int) -> tuple[int, int]:
    """Metadata-only resize of an already-decoded raster — kept for the
    historical seam; `resize_image_real` does the full pixel resample
    for netpbm payloads, `resize_dims` the pure arithmetic."""
    return resize_dims(width, height, target_long_side)


def resize_dims(width: int, height: int, target_long_side: int) -> tuple[int, int]:
    """Aspect-preserving integer resize arithmetic (floor), long side
    clamped to ``target_long_side``; never upscales."""
    long_side = max(width, height)
    if long_side <= target_long_side or long_side == 0:
        return width, height
    return (
        width * target_long_side // long_side,
        height * target_long_side // long_side,
    )


def sample_frames_real(payload: bytes, stride: int = FRAME_STRIDE) -> list[dict]:
    """Decode a video payload and return every ``stride``-th frame."""
    raise NotImplementedError(
        "real frame sampling needs ffmpeg/pyav (not in this container); "
        "use fake_sample_frames — identical signature and row shape"
    )


def fake_sample_frames(
    doc_id: int,
    payload: bytes,
    frame_size: int = FRAME_SIZE,
    stride: int = FRAME_STRIDE,
) -> list[dict]:
    """Deterministic stand-in: the payload holds one 'frame' per
    ``frame_size`` bytes; emit every ``stride``-th frame with its byte
    offset and an md5 'thumbnail hash' of (doc_id, frame_no)."""
    n_frames = len(payload) // frame_size
    out = []
    for frame_no in range(0, n_frames, stride):
        out.append(
            {
                "frame_no": frame_no,
                "frame_offset": frame_no * frame_size,
                "frame_hash": hashlib.md5(
                    f"{doc_id}|{frame_no}".encode()
                ).hexdigest(),
            }
        )
    return out
