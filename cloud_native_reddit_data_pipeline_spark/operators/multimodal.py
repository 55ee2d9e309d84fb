"""Multimodal column plumbing (north-star extension; no counterpart in
the reference — SURVEY.md §2 "not present" list / BASELINE.json).

Image/audio/video payloads are opaque `binary` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched `mapInPandas` stages.

All three modality paths are REAL (`DECODERS`): IMAGE payloads are
conforming PNGs, decoded/re-encoded by the pure-stdlib codec in
`functions/png.py` (zlib + scanline filters), features are pixel
histograms, resize is a true nearest-neighbor resample.  AUDIO
payloads are PCM16 WAVs decoded by `functions/wav.py` (stdlib
wave+struct), features are duration/rms/zcr/peak + amplitude
histogram, and `resample_audio` is a true linear resample.  VIDEO
payloads are uncompressed Y4M (YUV4MPEG2) streams decoded by
`functions/y4m.py` (text header + raw luma planes), features are
duration/frame-count/mean-luma/motion + pooled luma histogram, and
`extract_frames` decodes real frames and re-encodes them as PNGs
(the video→image bridge).  Compressed codecs (h264/jpeg/mp3) are the
one boundary this container cannot cross — swapping in ffmpeg/PIL
changes only the decoder registry entries, not the Spark plan.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in decoder for COMPRESSED payloads (h264
    etc. — no codec libs in this container): hashes payload bytes into
    a fixed-dim float vector.  Kept as the documented extension point;
    the three uncompressed paths below are real."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] * 31 + b) % 997
    return [round(a / 997.0, 6) for a in acc]


def _png_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """REAL image feature extraction: decode the PNG payload
    (functions/png.py, pure stdlib) and return its normalized
    intensity histogram."""
    from ..functions.png import decode_png, histogram_features

    if payload is None:
        return [0.0] * dim
    _, _, pixels = decode_png(payload)
    return histogram_features(pixels, bins=dim)


def _wav_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """REAL audio feature extraction: decode the PCM16 WAV payload
    (functions/wav.py, pure stdlib) and compute duration/rms/zcr/peak
    plus the normalized amplitude histogram."""
    from ..functions.wav import audio_features, decode_wav

    if payload is None:
        return [0.0] * dim
    rate, samples = decode_wav(payload)
    return audio_features(rate, samples, dim)


def _y4m_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """REAL video feature extraction: decode the Y4M payload
    (functions/y4m.py, pure stdlib) and compute duration/frames/mean-
    luma/motion plus the pooled luma histogram."""
    from ..functions.y4m import decode_y4m, video_features

    if payload is None:
        return [0.0] * dim
    w, h, fn, fd, frames = decode_y4m(payload)
    return video_features(w, h, fn, fd, frames, dim)


# modality -> feature decoder; all three are real pure-stdlib codecs
# (PNG / PCM16 WAV / Y4M) — _fake_decode_features above remains the
# extension point for compressed formats
DECODERS = {
    "image": _png_decode_features,
    "audio": _wav_decode_features,
    "video": _y4m_decode_features,
}


AUDIO_RATE = 8000


VIDEO_FPS = 2


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests.  All payloads are
    REAL: images are PNGs (functions/png.py), audio clips are PCM16
    WAVs (functions/wav.py), videos are Y4M luma streams
    (functions/y4m.py), all derived from media_id."""
    from ..functions.png import encode_png
    from ..functions.wav import encode_wav
    from ..functions.y4m import encode_y4m

    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        if modality == "image":
            w, h = 64 + i % 8, 64 + i % 4
        elif modality == "video":
            # smaller frames than images: N frames per payload
            w, h = 32 + i % 8, 24 + i % 4
        else:
            w = h = None
        duration_ms = 1000 * (1 + i % 30) if modality == "video" else None
        if modality == "image":
            pixels = bytes(((i * 7 + x * 13) % 251) for x in range(w * h))
            payload = encode_png(w, h, pixels)
        elif modality == "audio":
            n_samples = 160 + (i % 5) * 80
            samples = [
                ((i * 7 + j * 13) % 251 - 125) * 200 for j in range(n_samples)
            ]
            payload = encode_wav(AUDIO_RATE, samples)
            duration_ms = n_samples * 1000 // AUDIO_RATE
        else:
            frames = [
                bytes(((i * 7 + f * 31 + x * 13) % 251) for x in range(w * h))
                for f in range(duration_ms * VIDEO_FPS // 1000)
            ]
            payload = encode_y4m(w, h, VIDEO_FPS, 1, frames)
        rows.append(
            (
                i,
                modality,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                w,
                h,
                duration_ms,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction: binary payload -> array<float>.

    All three modalities go through REAL pure-stdlib decodes (PNG /
    PCM16 WAV / Y4M luma) — see DECODERS.

    Arrow moves each partition in columnar batches; the decoder is
    initialized once per partition (executor-singleton pattern), which
    is the 100-TB-correct shape for heavyweight codecs/models."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("modality", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # decoder init would happen HERE, once per partition
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "features": [
                        DECODERS[m](p)
                        for m, p in zip(pdf["modality"], pdf["payload"])
                    ],
                }
            )

    return media.mapInPandas(_extract, out_schema)


def resize_images(media: DataFrame, max_side: int = 32) -> DataFrame:
    """REAL image resize via mapInPandas: decode the PNG payload, aspect-
    preserving nearest-neighbor resample of the actual pixels, re-encode
    to PNG (functions/png.py, pure stdlib — no PIL needed).

    Scale shape: narrow map, no shuffle; payload bytes stay inside Arrow
    batches — a 100 TB image corpus resizes with zero data movement
    beyond the scan and write."""
    import pandas as pd

    from ..functions.png import decode_png, encode_png, resample_nearest

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("new_width", T.IntegerType(), True),
            T.StructField("new_height", T.IntegerType(), True),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def _target(w, h):
        if w is None or h is None:
            return None, None
        scale = max_side / max(w, h)
        if scale >= 1.0:
            return int(w), int(h)
        return max(1, round(w * scale)), max(1, round(h * scale))

    def _resample(payload: bytes, nw: int, nh: int) -> bytes:
        if payload is None or nw is None:
            return None
        w, h, pixels = decode_png(payload)
        if (nw, nh) == (w, h):
            return bytes(payload)
        return encode_png(nw, nh, resample_nearest(pixels, w, h, nw, nh))

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            dims = [_target(w, h) for w, h in zip(pdf["width"], pdf["height"])]
            nw = [d[0] for d in dims]
            nh = [d[1] for d in dims]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "new_width": pd.array(nw, dtype="Int32"),
                    "new_height": pd.array(nh, dtype="Int32"),
                    "payload": [
                        _resample(p, w, h)
                        for p, w, h in zip(pdf["payload"], nw, nh)
                    ],
                }
            )

    return media.filter(F.col("modality") == "image").mapInPandas(_resize, out_schema)


def resample_audio(media: DataFrame, target_rate: int = 16000) -> DataFrame:
    """REAL audio resample via mapInPandas: decode the PCM16 WAV
    payload, linear-interpolation resample of the actual samples to
    `target_rate`, re-encode (functions/wav.py, pure stdlib — no ffmpeg
    needed).

    Scale shape mirrors resize_images: narrow map, no shuffle; payload
    bytes stay inside Arrow batches — a 100 TB audio corpus resamples
    with zero data movement beyond the scan and write."""
    import pandas as pd

    from ..functions.wav import decode_wav, encode_wav, resample_linear

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("src_rate", T.IntegerType(), True),
            T.StructField("dst_rate", T.IntegerType(), False),
            T.StructField("n_samples", T.IntegerType(), True),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def _one(payload: bytes):
        if payload is None:
            return None, None, None
        rate, samples = decode_wav(payload)
        res = resample_linear(samples, rate, target_rate)
        return rate, len(res), encode_wav(target_rate, res)

    def _resample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            done = [_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "src_rate": pd.array([d[0] for d in done], dtype="Int32"),
                    "dst_rate": pd.array([target_rate] * len(done), dtype="Int32"),
                    "n_samples": pd.array([d[1] for d in done], dtype="Int32"),
                    "payload": [d[2] for d in done],
                }
            )

    return media.filter(F.col("modality") == "audio").mapInPandas(_resample, out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode each video into frame
    timestamps (native `sequence`+`explode`) WITHOUT touching payload
    bytes.  Demonstrates that the cheap metadata fan-out (1 row -> N
    timestamps) happens JVM-side; the payload-carrying decode path is
    `extract_frames`, which fans out inside the Arrow batch instead so
    the payload bytes are never duplicated N× through a shuffle."""
    frames = media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    return frames


def decode_frame(payload: bytes, frame_ts_ms: int) -> tuple[int, int, bytes]:
    """REAL single-frame decode: (width, height, luma_pixels) of the
    Y4M frame covering `frame_ts_ms` (functions/y4m.py, pure stdlib).
    Compressed codecs (h264 etc.) would slot in here via ffmpeg."""
    from ..functions.y4m import frame_at

    return frame_at(payload, frame_ts_ms)


def extract_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL video frame extraction via mapInPandas: decode each Y4M
    payload ONCE, sample a frame every `every_ms`, and re-encode each
    sampled frame as a grayscale PNG — the video→image bridge that
    feeds frames into the image featurize/resize/dedup family.

    Scale shape: narrow map, no shuffle; the 1→N fan-out happens
    INSIDE the Arrow batch (variable-length mapInPandas output), so
    the multi-megabyte payload is decoded once per video and never
    duplicated N× the way a JVM-side explode of the payload column
    would be."""
    import pandas as pd

    from ..functions.png import encode_png
    from ..functions.y4m import decode_y4m

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ts_ms", T.IntegerType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def _frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_ts_ms", "width", "height", "payload")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                w, h, fn, fd, frames = decode_y4m(bytes(payload))
                dur_ms = len(frames) * 1000 * fd // fn
                for ts in range(0, max(dur_ms, 1), every_ms):
                    idx = min(ts * fn // (1000 * fd), len(frames) - 1)
                    out["media_id"].append(mid)
                    out["frame_ts_ms"].append(ts)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["payload"].append(encode_png(w, h, frames[idx]))
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("modality") == "video")
        .select("media_id", "payload")
        .mapInPandas(_frames, out_schema)
    )


def image_patches(media: DataFrame, patch: int = 8) -> DataFrame:
    """ViT-style image patching: decode each PNG ONCE and emit one row
    per non-overlapping patch x patch tile — (media_id, patch_row,
    patch_col, mean_intensity, pixels) — the tokenization step of a
    vision-transformer training pipeline (image -> patch sequence).
    Ragged right/bottom tiles are emitted at their true size.

    Scale shape: same as `extract_frames` — the 1->N fan-out happens
    INSIDE the Arrow batch (variable-length mapInPandas output), so the
    payload is decoded once per image and its bytes never ride an
    exploded column through a shuffle; downstream patch embedding
    consumes fixed-size byte rows."""
    import pandas as pd

    from ..functions.png import decode_png

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("patch_row", T.IntegerType(), False),
            T.StructField("patch_col", T.IntegerType(), False),
            T.StructField("pw", T.IntegerType(), False),
            T.StructField("ph", T.IntegerType(), False),
            T.StructField("mean_intensity", T.DoubleType(), False),
            T.StructField("pixels", T.BinaryType(), False),
        ]
    )

    def _patches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ("media_id", "patch_row", "patch_col", "pw", "ph",
                "mean_intensity", "pixels")
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                w, h, pixels = decode_png(bytes(payload))
                for pr in range((h + patch - 1) // patch):
                    for pc in range((w + patch - 1) // patch):
                        ph = min(patch, h - pr * patch)
                        pw = min(patch, w - pc * patch)
                        tile = bytearray()
                        for dy in range(ph):
                            row0 = (pr * patch + dy) * w + pc * patch
                            tile += pixels[row0 : row0 + pw]
                        out["media_id"].append(mid)
                        out["patch_row"].append(pr)
                        out["patch_col"].append(pc)
                        out["pw"].append(pw)
                        out["ph"].append(ph)
                        out["mean_intensity"].append(
                            round(sum(tile) / len(tile), 6)
                        )
                        out["pixels"].append(bytes(tile))
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("modality") == "image")
        .select("media_id", "payload")
        .mapInPandas(_patches, out_schema)
    )


def vad_segments(
    media: DataFrame, frame_ms: int = 20, threshold: float = 0.5
) -> DataFrame:
    """Energy-threshold voice-activity detection over PCM16 WAV
    payloads: per-frame RMS energy, frames above `threshold` x the
    clip's overall RMS are voiced, and consecutive voiced frames merge
    into segments — (media_id, seg_start_ms, seg_end_ms, n_frames,
    mean_energy).  The speech-data curation primitive (silence
    trimming, speech-ratio filtering) ahead of ASR/audio-LM training.

    Scale shape: one decode per clip inside the Arrow batch, segment
    fan-out in-batch (a clip yields at most duration/frame_ms rows),
    no shuffle."""
    import pandas as pd

    from ..functions.wav import decode_wav

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("seg_start_ms", T.IntegerType(), False),
            T.StructField("seg_end_ms", T.IntegerType(), False),
            T.StructField("n_frames", T.IntegerType(), False),
            T.StructField("mean_energy", T.DoubleType(), False),
        ]
    )

    def _vad(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ("media_id", "seg_start_ms", "seg_end_ms", "n_frames", "mean_energy")
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                rate, samples = decode_wav(bytes(payload))
                if not samples:
                    continue
                spf = max(rate * frame_ms // 1000, 1)
                clip_rms = (sum(s * s for s in samples) / len(samples)) ** 0.5
                gate = threshold * clip_rms
                seg = None  # (start_frame, energies)
                n_frames_total = (len(samples) + spf - 1) // spf
                for fi in range(n_frames_total):
                    fr = samples[fi * spf : (fi + 1) * spf]
                    rms = (sum(s * s for s in fr) / len(fr)) ** 0.5
                    if rms > gate:
                        if seg is None:
                            seg = (fi, [])
                        seg[1].append(rms)
                    elif seg is not None:
                        out["media_id"].append(mid)
                        out["seg_start_ms"].append(seg[0] * frame_ms)
                        out["seg_end_ms"].append(fi * frame_ms)
                        out["n_frames"].append(len(seg[1]))
                        out["mean_energy"].append(
                            round(sum(seg[1]) / len(seg[1]), 6)
                        )
                        seg = None
                if seg is not None:
                    out["media_id"].append(mid)
                    out["seg_start_ms"].append(seg[0] * frame_ms)
                    out["seg_end_ms"].append(n_frames_total * frame_ms)
                    out["n_frames"].append(len(seg[1]))
                    out["mean_energy"].append(round(sum(seg[1]) / len(seg[1]), 6))
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("modality") == "audio")
        .select("media_id", "payload")
        .mapInPandas(_vad, out_schema)
    )


def scene_changes(media: DataFrame, threshold: float = 12.0) -> DataFrame:
    """Scene-change detection over Y4M video payloads: mean absolute
    luma difference between consecutive frames; a jump above
    `threshold` marks a cut — (media_id, frame_idx, frame_ts_ms,
    mean_abs_diff).  The video curation twin of `vad_segments`
    (shot segmentation ahead of frame sampling: sample per SCENE, not
    per second, so long static shots don't dominate the frame set).

    Scale shape: one decode per video inside the Arrow batch, cut rows
    fan out in-batch (at most n_frames-1 per clip), no shuffle."""
    import pandas as pd

    from ..functions.y4m import decode_y4m

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ts_ms", T.IntegerType(), False),
            T.StructField("mean_abs_diff", T.DoubleType(), False),
        ]
    )

    def _cuts(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ("media_id", "frame_idx", "frame_ts_ms", "mean_abs_diff")
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                w, h, fn, fd, frames = decode_y4m(bytes(payload))
                for i in range(1, len(frames)):
                    a, b = frames[i - 1], frames[i]
                    diff = sum(abs(x - y) for x, y in zip(a, b)) / len(a)
                    if diff > threshold:
                        out["media_id"].append(mid)
                        out["frame_idx"].append(i)
                        out["frame_ts_ms"].append(i * 1000 * fd // fn)
                        out["mean_abs_diff"].append(round(diff, 6))
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("modality") == "video")
        .select("media_id", "payload")
        .mapInPandas(_cuts, out_schema)
    )


def image_phash(media: DataFrame) -> DataFrame:
    """64-bit mean-threshold perceptual hash per image (aHash): decode
    the PNG, nearest-resample to 8x8, threshold each cell at the
    image mean — the resolution-invariant fingerprint image-dedup
    pipelines key on (a resized copy hashes identically or within a
    few bits; see the phash dedup query).  Arrow-batched mapInPandas
    narrow map over (media_id, payload); returns (media_id, phash) with
    the hash as a signed 64-bit int (bit i of the row-major 8x8 grid is
    1 << (63 - i))."""
    import pandas as pd

    from ..functions.png import decode_png, resample_nearest

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("phash", T.LongType(), True),
        ]
    )

    def _one(payload: bytes) -> int | None:
        if payload is None:
            return None
        w, h, px = decode_png(bytes(payload))
        small = resample_nearest(px, w, h, 8, 8)
        m = sum(small) / 64.0
        bits = 0
        for i, p in enumerate(small):
            if p >= m:
                bits |= 1 << (63 - i)
        # two's-complement into a signed 64-bit long
        return bits - (1 << 64) if bits >= (1 << 63) else bits

    def _hashes(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": [_one(p) for p in pdf["payload"]],
                }
            )

    return (
        media.filter(F.col("modality") == "image")
        .select("media_id", "payload")
        .mapInPandas(_hashes, out_schema)
    )


def phash_candidate_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 10,
    bands: int = 4,
) -> DataFrame:
    """(id_a, id_b) near-duplicate image pairs: band the 64-bit phash
    into `bands` 16-bit keys, bucket-join on band equality (a pair
    within hamming distance d < 64/bands*... shares at least one band
    by pigeonhole when d < bands), then verify exact hamming via
    bit_count(xor) — the SimHash banding tactic applied to perceptual
    hashes.  No all-pairs join: candidates come from band-key equality
    only."""
    width = 64 // bands
    mask = (1 << width) - 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col(hash_col), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for b in range(bands)
        ]
    )
    banded = hashes.select(
        F.col(id_col), F.col(hash_col), F.explode(band_structs).alias("bk")
    ).select(
        id_col, hash_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(
        F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}"))
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def audio_fingerprint(media: DataFrame, n_windows: int = 64) -> DataFrame:
    """63-bit energy-delta audio fingerprint (chromaprint-shaped):
    decode the PCM16 WAV, split into `n_windows` equal windows, and
    emit one bit per adjacent-window energy comparison (exact integer
    energies, so the fingerprint is deterministic) — rate-invariant to
    within a few bits (a 2x linear resample measured hamming <= 4), so
    the same banded-hamming pairing that dedups images
    (`phash_candidate_pairs`) dedups audio across sample rates.
    Arrow-batched narrow map; returns (media_id, afp)."""
    import pandas as pd
    import struct as _struct

    from ..functions.wav import decode_wav

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("afp", T.LongType(), True),
        ]
    )

    def _one(payload: bytes) -> int | None:
        if payload is None:
            return None
        _, samples = decode_wav(bytes(payload))
        n = len(samples)
        if n < n_windows:
            samples = list(samples) + [0] * (n_windows - n)
            n = n_windows
        e = []
        for i in range(n_windows):
            lo, hi = i * n // n_windows, (i + 1) * n // n_windows
            e.append(sum(s * s for s in samples[lo:hi]))
        bits = 0
        for i in range(63):
            if e[i % n_windows] >= e[(i + 1) % n_windows]:
                bits |= 1 << (62 - i)
        return bits

    def _fps(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "afp": [_one(p) for p in pdf["payload"]],
                }
            )

    return (
        media.filter(F.col("modality") == "audio")
        .select("media_id", "payload")
        .mapInPandas(_fps, out_schema)
    )
