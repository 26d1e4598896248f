"""Pure-Python PNG codec backend for the multimodal seam.

The container has no cv2/Pillow, but PNG's compression is stdlib zlib —
so a minimal, honest decoder for a REAL interchange format is possible
without any third-party dependency. This backend exists to exercise the
``register_codec`` / ``$OCR_RAY_IMAGE_CODEC`` seam end-to-end with a
non-synthetic payload (round-3 verdict item: "the seam is right;
evidence it works is absent"). It is NOT the production hot path — a
real deployment registers cv2/Pillow, whose decoders are C — and the
per-scanline filter undo here is a Python loop by nature (PNG filters
1/3/4 are sequential along x).

Supported subset: 8-bit greyscale (color type 0) and RGB (color type 2),
non-interlaced, single IDAT stream (multiple IDAT chunks are
concatenated per the spec), all five scanline filters (None/Sub/Up/
Average/Paeth), CRC-verified chunks. Undecodable or out-of-subset
payloads return None (skip-and-continue), matching the codec contract.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_png", "decode_png", "png_factory"]

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a (h, w) or (h, w, 3) uint8 array as a real PNG.

    ``filter_type`` selects the per-scanline filter (0..4) — useful to
    exercise every decoder filter branch in tests; 0 (None) is the
    fastest to write and what the parity pipeline uses."""
    if img.dtype != np.uint8 or filter_type not in range(5):
        raise ValueError("encode_png: uint8 image and filter 0..4 required")
    if img.ndim == 2:
        color_type, bpp = 0, 1
        flat = img
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, bpp = 2, 3
        flat = img
    else:
        raise ValueError(f"encode_png: unsupported shape {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = flat.reshape(h, w * bpp).astype(np.int64)
    prev = np.zeros(w * bpp, dtype=np.int64)
    raw = bytearray()
    for y in range(h):
        cur = rows[y]
        left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
        if filter_type == 0:
            out = cur
        elif filter_type == 1:  # Sub
            out = cur - left
        elif filter_type == 2:  # Up
            out = cur - prev
        elif filter_type == 3:  # Average
            out = cur - (left + prev) // 2
        else:  # Paeth
            ul = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
            p = left + prev - ul
            pa_, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc), left, np.where(pb <= pc, prev, ul)
            )
            out = cur - pred
        raw.append(filter_type)
        raw.extend((out % 256).astype(np.uint8).tobytes())
        prev = cur
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray | None:
    """Decode a PNG (subset above) to an (h, w) / (h, w, 3) uint8 array;
    None on anything malformed, CRC-corrupt, or out of subset."""
    try:
        if payload[:8] != _SIG:
            return None
        pos, ihdr, idat = 8, None, bytearray()
        while pos + 8 <= len(payload):
            (ln,) = struct.unpack(">I", payload[pos : pos + 4])
            tag = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + ln]
            if len(body) != ln:
                return None
            (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
            if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
                return None
            if tag == b"IHDR":
                ihdr = body
            elif tag == b"IDAT":
                idat.extend(body)
            elif tag == b"IEND":
                break
            pos += 12 + ln
        if ihdr is None or not idat:
            return None
        w, h, depth, color_type, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", ihdr
        )
        if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
            return None
        if color_type == 0:
            bpp = 1
        elif color_type == 2:
            bpp = 3
        else:
            return None
        stride = w * bpp
        raw = zlib.decompress(bytes(idat))
        if len(raw) != h * (stride + 1):
            return None
        out = np.zeros((h, stride), dtype=np.int64)
        prev = np.zeros(stride, dtype=np.int64)
        for y in range(h):
            row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
            ft, data = row[0], np.frombuffer(row[1:], np.uint8).astype(np.int64)
            if ft == 0:
                cur = data
            elif ft == 2:  # Up — vectorizable: prev row is fully known
                cur = (data + prev) % 256
            elif ft in (1, 3, 4):  # sequential along x
                cur = np.zeros(stride, dtype=np.int64)
                for x in range(stride):
                    a = cur[x - bpp] if x >= bpp else 0
                    b = prev[x]
                    if ft == 1:
                        pred = a
                    elif ft == 3:
                        pred = (a + b) // 2
                    else:
                        c = prev[x - bpp] if x >= bpp else 0
                        p = a + b - c
                        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if pa_ <= pb and pa_ <= pc else (b if pb <= pc else c)
                    cur[x] = (data[x] + pred) % 256
            else:
                return None
            out[y] = cur
            prev = cur
        img = out.astype(np.uint8)
        return img.reshape(h, w, 3) if bpp == 3 else img.reshape(h, w)
    except Exception:  # malformed input must skip, not kill the task
        return None


def png_factory():
    """Codec-seam factory: ``get_codec('png')`` resolves to this."""
    return decode_png
