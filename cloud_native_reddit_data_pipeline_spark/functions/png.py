"""Minimal pure-stdlib PNG codec: 8-bit grayscale, non-interlaced.

This is the REAL decode path for the multimodal image columns — no
codec libraries exist in this container, but PNG's container format is
just zlib + per-scanline filters, both expressible with the standard
library.  The encoder writes filter-0 scanlines; the decoder implements
the full filter set (None/Sub/Up/Average/Paeth), so it reads any
conforming 8-bit grayscale PNG, not just our own output.

Used inside Arrow-batched `mapInPandas` stages (operators/multimodal.py)
— the per-row Python cost is the same shape a PIL/ffmpeg deployment
would have; swapping in a native codec changes only the function body.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """8-bit grayscale PNG from raw row-major pixel bytes."""
    if len(pixels) != width * height:
        raise ValueError(f"expected {width * height} pixels, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit grayscale non-interlaced PNG.

    Returns (width, height, row-major pixel bytes).  Verifies chunk CRCs
    and implements all five scanline filters (bpp = 1)."""
    if bytes(payload[:8]) != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = bytes(payload[pos + 4 : pos + 8])
        data = bytes(payload[pos + 8 : pos + 8 + ln])
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError("only 8-bit grayscale non-interlaced supported")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (width + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = bytearray()
    prev = bytes(width)
    for y in range(height):
        ft = raw[y * (width + 1)]
        line = bytearray(raw[y * (width + 1) + 1 : (y + 1) * (width + 1)])
        if ft == 1:  # Sub
            for x in range(1, width):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif ft == 2:  # Up
            for x in range(width):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(width):
                a = line[x - 1] if x else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(width):
                a = line[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown scanline filter {ft}")
        out += line
        prev = bytes(line)
    return width, height, bytes(out)


def resample_nearest(
    pixels: bytes, w: int, h: int, nw: int, nh: int
) -> bytes:
    """Nearest-neighbor resample of row-major grayscale pixels."""
    out = bytearray(nw * nh)
    for y in range(nh):
        src_row = (y * h // nh) * w
        dst_row = y * nw
        for x in range(nw):
            out[dst_row + x] = pixels[src_row + x * w // nw]
    return bytes(out)


def histogram_features(pixels: bytes, bins: int = 16) -> list[float]:
    """Normalized `bins`-bin intensity histogram — the deterministic
    feature vector for decoded images."""
    counts = [0] * bins
    for b in pixels:
        counts[b * bins // 256] += 1
    n = max(1, len(pixels))
    return [round(c / n, 6) for c in counts]
