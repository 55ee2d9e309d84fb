"""Pure-stdlib Y4M (YUV4MPEG2) codec — the REAL video path for the
multimodal operators, exactly like functions/png.py is for images and
functions/wav.py is for audio: no ffmpeg needed, because YUV4MPEG2 is
just a text header plus raw uncompressed planes.

Scope: the encoder writes `Cmono` streams (one 8-bit luma plane per
frame — the grayscale twin of the PNG path); the decoder additionally
reads the common `C420*` chroma subsamplings (luma kept, chroma
skipped), so it ingests any conforming mono/4:2:0 stream, not just our
own output.  Compressed codecs (h264/vp9) stay behind a declared-stub
boundary — swapping in ffmpeg changes only the registry entry in
operators/multimodal.py, not the Spark plan.

Format (public mjpegtools spec): stream header
`YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip A1:1 C<fmt>]\\n`, then per frame
`FRAME[ params]\\n` followed by the raw plane bytes.
"""

from __future__ import annotations

_MAGIC = b"YUV4MPEG2"

# colourspace tag -> chroma bytes per frame as a fraction of w*h
_CHROMA_FRACTION = {
    "mono": 0.0,
    "420": 0.5,
    "420jpeg": 0.5,
    "420mpeg2": 0.5,
    "420paldv": 0.5,
}


def encode_y4m(
    width: int,
    height: int,
    fps_num: int,
    fps_den: int,
    frames: list[bytes],
) -> bytes:
    """Encode 8-bit luma frames (row-major, w*h bytes each) as a
    YUV4MPEG2 `Cmono` stream."""
    for i, f in enumerate(frames):
        if len(f) != width * height:
            raise ValueError(
                f"frame {i}: expected {width * height} luma bytes, got {len(f)}"
            )
    head = f"YUV4MPEG2 W{width} H{height} F{fps_num}:{fps_den} Ip A1:1 Cmono\n"
    return head.encode("ascii") + b"".join(b"FRAME\n" + f for f in frames)


def decode_y4m(payload: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """Decode a YUV4MPEG2 stream to (width, height, fps_num, fps_den,
    luma_frames).  Accepts Cmono and C420* colourspaces; for 4:2:0 the
    chroma planes are skipped and only luma is returned."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = None
    fps_num, fps_den = 30, 1
    cspace = "420jpeg"  # spec default when no C tag present
    for tok in payload[len(_MAGIC) : nl].decode("ascii").split():
        if tok.startswith("W"):
            width = int(tok[1:])
        elif tok.startswith("H"):
            height = int(tok[1:])
        elif tok.startswith("F"):
            num, den = tok[1:].split(":")
            fps_num, fps_den = int(num), int(den)
        elif tok.startswith("C"):
            cspace = tok[1:]
    if width is None or height is None:
        raise ValueError("YUV4MPEG2 header missing W/H")
    if cspace not in _CHROMA_FRACTION:
        raise ValueError(f"unsupported colourspace C{cspace}")
    luma = width * height
    chroma = int(luma * _CHROMA_FRACTION[cspace])
    frames: list[bytes] = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated FRAME header")
        pos = fnl + 1
        if pos + luma + chroma > n:
            raise ValueError("truncated frame payload")
        frames.append(payload[pos : pos + luma])
        pos += luma + chroma
    return width, height, fps_num, fps_den, frames


def frame_at(payload: bytes, ts_ms: int) -> tuple[int, int, bytes]:
    """Return (width, height, luma_pixels) of the frame covering
    timestamp `ts_ms` (floor of ts * fps, clamped to the last frame)."""
    width, height, fps_num, fps_den, frames = decode_y4m(payload)
    if not frames:
        raise ValueError("empty stream")
    idx = max(0, min(ts_ms * fps_num // (1000 * fps_den), len(frames) - 1))
    return width, height, frames[idx]


def duration_ms(payload: bytes) -> int:
    """Stream duration in milliseconds (n_frames / fps)."""
    _, _, fps_num, fps_den, frames = decode_y4m(payload)
    return len(frames) * 1000 * fps_den // fps_num


def video_features(
    width: int,
    height: int,
    fps_num: int,
    fps_den: int,
    frames: list[bytes],
    dim: int = 16,
) -> list[float]:
    """Real per-clip features: [duration_s, n_frames, mean luma,
    motion (mean abs inter-frame luma delta, 0..1)] followed by a
    (dim-4)-bin normalized luma histogram pooled over all frames.
    Deterministic, model-free — the same shape an embedding model
    would fill."""
    if not frames or dim < 5:
        return [0.0] * dim
    n_px = width * height
    dur = len(frames) * fps_den / fps_num
    total = sum(sum(f) for f in frames)
    mean_luma = total / (n_px * len(frames) * 255.0)
    if len(frames) > 1:
        diff = sum(
            sum(abs(a - b) for a, b in zip(prev, cur))
            for prev, cur in zip(frames, frames[1:])
        )
        motion = diff / (n_px * (len(frames) - 1) * 255.0)
    else:
        motion = 0.0
    n_bins = dim - 4
    bins = [0] * n_bins
    for f in frames:
        for p in f:
            bins[p * n_bins // 256] += 1
    feats = [dur, float(len(frames)), mean_luma, motion] + [
        b / (n_px * len(frames)) for b in bins
    ]
    return [round(x, 6) for x in feats]
