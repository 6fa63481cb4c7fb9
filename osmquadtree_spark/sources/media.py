"""Multimodal payload columns: audio and video as opaque binary with typed
metadata (north-rule training-data extension; the image twin lives in
sources/images.py).

The container has no real audio/video codecs, so the CODECS here are
deterministic fakes behind the same interface a real libsndfile/pyav
adapter would implement — the Spark-side plumbing (schemas, Arrow batch
shapes, mapInPandas signatures, partitioning) is real and tested, and the
payload round-trips bit-exactly. Swap `encode_*`/`decode_*` for real codecs
in production; `decode_audio_real`/`decode_video_real` raise
NotImplementedError to mark the seam.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .images import splitmix64

AUDIO_SCHEMA = (
    "clip_id bigint, bytes binary, sample_rate int, n_samples int, fmt string"
)
VIDEO_SCHEMA = (
    "video_id bigint, bytes binary, w int, h int, fps int, n_frames int, fmt string"
)

FAKE_AUDIO_MAGIC = b"FAUD"
FAKE_VIDEO_MAGIC = b"FVID"


def samples_for(seed: int, n: int) -> np.ndarray:
    """Deterministic int16 waveform: a splitmix64-parameterized sawtooth mix."""
    u = int(splitmix64(np.uint64(seed)))
    f1 = (u & 0xFF) + 16
    f2 = ((u >> 8) & 0xFF) + 4
    t = np.arange(n, dtype=np.int64)
    w = ((t * f1) % 8192 - 4096) + (((t * f2) % 4096 - 2048) >> 1)
    return np.clip(w, -32768, 32767).astype(np.int16)


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    return (
        FAKE_AUDIO_MAGIC
        + struct.pack(">II", sample_rate, len(samples))
        + zlib.compress(samples.astype("<i2").tobytes(), 6)
    )


def decode_audio(data: bytes):
    """→ (sample_rate, int16 samples). Lossless round trip."""
    if data[:4] != FAKE_AUDIO_MAGIC:
        raise ValueError("not fake-audio bytes")
    sr, n = struct.unpack(">II", data[4:12])
    s = np.frombuffer(zlib.decompress(data[12:]), dtype="<i2")
    if len(s) != n:
        raise ValueError("length mismatch")
    return sr, s


def decode_audio_real(data: bytes):
    """Production seam: a real codec adapter (soundfile/librosa) goes here."""
    raise NotImplementedError("no audio codec in this container — swap in soundfile")


def frames_for(seed: int, w: int, h: int, n_frames: int) -> np.ndarray:
    """(n_frames, h, w) uint8 gray frames: per-frame shifted gradient."""
    u = int(splitmix64(np.uint64(seed)))
    a = (u & 0x3F) | 1
    y, x = np.mgrid[0:h, 0:w]
    base = (x * a + y) % 256
    out = np.empty((n_frames, h, w), dtype=np.uint8)
    for f in range(n_frames):
        out[f] = (base + 7 * f) % 256
    return out


def encode_video(frames: np.ndarray, fps: int) -> bytes:
    n, h, w = frames.shape
    return (
        FAKE_VIDEO_MAGIC
        + struct.pack(">IIII", w, h, fps, n)
        + zlib.compress(frames.tobytes(), 6)
    )


def decode_video(data: bytes):
    """→ (fps, (n, h, w) uint8 frames). Lossless round trip."""
    if data[:4] != FAKE_VIDEO_MAGIC:
        raise ValueError("not fake-video bytes")
    w, h, fps, n = struct.unpack(">IIII", data[4:20])
    fr = np.frombuffer(zlib.decompress(data[20:]), dtype=np.uint8).reshape(n, h, w)
    return fps, fr


def decode_video_real(data: bytes):
    """Production seam: a real demuxer adapter (pyav/ffmpeg) goes here."""
    raise NotImplementedError("no video codec in this container — swap in pyav")


# -- distributed generation (same index-pure pattern as images_df) -------------

_SR_CYCLE = (8000, 16000, 22050, 44100)
_LEN_CYCLE = (800, 1600, 2400, 4000)
_VID_WH = ((32, 24), (64, 48), (48, 32), (96, 64))


def audio_df(spark, n: int, partitions: int = 32):
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].astype("int64"):
                i = int(i)
                sr = _SR_CYCLE[i % 4]
                ns = _LEN_CYCLE[(i // 4) % 4]
                s = samples_for(i, ns)
                rows.append((i, encode_audio(s, sr), sr, ns, "fake_pcm_z"))
            yield pd.DataFrame(
                rows, columns=["clip_id", "bytes", "sample_rate", "n_samples", "fmt"]
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, AUDIO_SCHEMA)


def video_df(spark, n: int, partitions: int = 32):
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].astype("int64"):
                i = int(i)
                w, h = _VID_WH[i % 4]
                fps = 10 + (i % 3) * 5
                nf = 4 + i % 5
                fr = frames_for(i, w, h, nf)
                rows.append((i, encode_video(fr, fps), w, h, fps, nf, "fake_gray_z"))
            yield pd.DataFrame(
                rows,
                columns=["video_id", "bytes", "w", "h", "fps", "n_frames", "fmt"],
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, VIDEO_SCHEMA)
