"""Media codec seam (SURVEY §2.11 X6): the boundary between the engine's
Spark plumbing (schemas, Arrow batching, 1→N frame expansion,
partitioning) and the actual codecs.

This container ships no image/audio/video libraries, so every ``*_real``
function raises ``NotImplementedError`` with the intended dependency
spelled out; the ``fake_*`` twin is a deterministic stand-in with the
same signature and output shape, used by the oracle-checked queries
(x52/x53/x83). Swapping real for fake changes *values*, never plans,
schemas, or batch shapes — which is exactly the part a Spark engine owns.

All fakes derive outputs purely from payload length / content bytes so
the DuckDB oracle can replicate them in SQL.
"""

from __future__ import annotations

import hashlib

FRAME_SIZE = 100  # fake codec: 1 "frame" per 100 payload bytes
FRAME_STRIDE = 10  # sample every 10th frame


def decode_image_real(payload: bytes) -> dict:
    """Decode an image payload to (width, height, mean_pixel)."""
    raise NotImplementedError(
        "real image decode needs PIL/opencv (not in this container); "
        "use fake_decode_image — identical signature and schema"
    )


def fake_decode_image(payload: bytes) -> dict:
    nbytes = len(payload)
    return {
        "width": nbytes % 640,
        "height": nbytes % 480,
        "mean_pixel": (nbytes * 37 % 256) / 255.0,
    }


def resize_real(width: int, height: int, target_long_side: int) -> tuple[int, int]:
    """Resize an image buffer; here only the metadata arithmetic."""
    raise NotImplementedError(
        "real resize needs PIL/opencv; use resize_dims for the metadata "
        "arithmetic (aspect-preserving), which is codec-independent"
    )


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
