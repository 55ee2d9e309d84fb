"""Pure-stdlib WAV codec (RIFF PCM16 mono) — the REAL audio path for
the multimodal operators, exactly like functions/png.py is for images:
no ffmpeg/soundfile needed, `wave` + `struct` only.

Scope: 16-bit signed PCM, mono.  That is the canonical uncompressed
training-audio interchange format; compressed codecs (mp3/aac) stay
behind the declared-stub boundary in operators/multimodal.py.
"""

from __future__ import annotations

import io
import math
import struct
import wave


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Encode 16-bit signed mono samples to a RIFF/WAVE byte string."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Decode a PCM16 mono WAV payload to (sample_rate, samples)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                f"expected PCM16 mono, got {w.getnchannels()}ch "
                f"{w.getsampwidth() * 8}-bit"
            )
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    return rate, list(struct.unpack(f"<{len(frames) // 2}h", frames))


def audio_features(sample_rate: int, samples: list[int], dim: int = 16) -> list[float]:
    """Real per-clip features: [duration_s, rms, zero-crossing rate,
    peak] followed by a (dim-4)-bin normalized |amplitude| histogram —
    all on the 0..1 scale except duration.  Deterministic, model-free."""
    n = len(samples)
    if n == 0 or dim < 5:
        return [0.0] * dim
    dur = n / sample_rate
    rms = math.sqrt(sum(s * s for s in samples) / n) / 32768.0
    zcr = sum(
        1 for i in range(1, n) if (samples[i - 1] < 0) != (samples[i] < 0)
    ) / max(n - 1, 1)
    peak = max(abs(s) for s in samples) / 32768.0
    n_bins = dim - 4
    bins = [0] * n_bins
    for s in samples:
        bins[min(abs(s) * n_bins // 32768, n_bins - 1)] += 1
    feats = [dur, rms, zcr, peak] + [b / n for b in bins]
    return [round(x, 6) for x in feats]


def resample_linear(samples: list[int], src_rate: int, dst_rate: int) -> list[int]:
    """Linear-interpolation resample (endpoint-preserving).  The naive
    but exact-deterministic kernel — a real deployment swaps in a
    windowed-sinc filter without touching the Spark plumbing."""
    if src_rate == dst_rate or not samples:
        return list(samples)
    n_in = len(samples)
    n_out = max(1, round(n_in * dst_rate / src_rate))
    if n_out == 1:
        return [samples[0]]
    out = []
    for i in range(n_out):
        pos = i * (n_in - 1) / (n_out - 1)
        lo = int(pos)
        hi = min(lo + 1, n_in - 1)
        frac = pos - lo
        out.append(int(round(samples[lo] * (1 - frac) + samples[hi] * frac)))
    return out
