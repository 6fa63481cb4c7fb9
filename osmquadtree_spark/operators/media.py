"""Multimodal feature-extraction operators over opaque audio/video binary
columns (mapInPandas Arrow-batch kernels; north-rule training-data axes).

Decode runs through the fake codecs (sources/media.py) — the real-codec
seam is one function swap; everything Spark-side (schemas, batch iteration,
derived features) is production-shaped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def audio_features(clips: DataFrame) -> DataFrame:
    """(clip_id, duration_ms, peak, rms_x1000, zero_crossings): decode +
    vectorized per-clip features. Integer/exact outputs so the oracle can
    restate them from the generation arithmetic."""
    from ..sources.media import decode_audio

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in ("clip_id", "duration_ms", "peak", "rms_x1000", "zero_crossings")}
            for cid, blob in zip(pdf["clip_id"], pdf["bytes"]):
                sr, s = decode_audio(bytes(blob))
                sf = s.astype(np.float64)
                out["clip_id"].append(int(cid))
                out["duration_ms"].append(int(len(s) * 1000 // sr))
                out["peak"].append(int(np.abs(s.astype(np.int32)).max()) if len(s) else 0)
                out["rms_x1000"].append(int(np.sqrt(np.mean(sf * sf)) * 1000) if len(s) else 0)
                out["zero_crossings"].append(int(((s[:-1].astype(np.int32) * s[1:]) < 0).sum()))
            yield pd.DataFrame(out)

    return clips.mapInPandas(
        gen,
        "clip_id bigint, duration_ms bigint, peak bigint, rms_x1000 bigint, zero_crossings bigint",
    )


def video_frame_sample(videos: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling: decode, keep every ``every``-th frame, emit one row
    per kept frame with its mean intensity — the shape of a
    frame-extraction stage feeding a vision encoder."""
    from ..sources.media import decode_video

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in ("video_id", "frame_idx", "mean_intensity_x100")}
            for vid, blob in zip(pdf["video_id"], pdf["bytes"]):
                fps, frames = decode_video(bytes(blob))
                for idx in range(0, len(frames), every):
                    out["video_id"].append(int(vid))
                    out["frame_idx"].append(idx)
                    out["mean_intensity_x100"].append(
                        int(frames[idx].astype(np.int64).sum() * 100 // frames[idx].size)
                    )
            yield pd.DataFrame(out)

    return videos.mapInPandas(
        gen, "video_id bigint, frame_idx int, mean_intensity_x100 bigint"
    )


def media_verify(clips: DataFrame, videos: DataFrame) -> DataFrame:
    """Round-trip gate for both modalities: decoded payloads must match the
    deterministic generators bit-exactly (the north rule's decoded-pixels
    invariant, applied to every opaque modality)."""
    from ..sources.media import decode_audio, decode_video, frames_for, samples_for

    def gen_a(batches):
        for pdf in batches:
            rows = []
            for cid, blob, sr, ns in zip(
                pdf["clip_id"], pdf["bytes"], pdf["sample_rate"], pdf["n_samples"]
            ):
                dsr, s = decode_audio(bytes(blob))
                ok = dsr == sr and len(s) == ns and bool(
                    np.array_equal(s, samples_for(int(cid), int(ns)))
                )
                rows.append((int(cid), "audio", ok))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "ok"])

    def gen_v(batches):
        for pdf in batches:
            rows = []
            for vid, blob, w, h, nf in zip(
                pdf["video_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["n_frames"]
            ):
                _, fr = decode_video(bytes(blob))
                ok = fr.shape == (nf, h, w) and bool(
                    np.array_equal(fr, frames_for(int(vid), int(w), int(h), int(nf)))
                )
                rows.append((int(vid), "video", ok))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "ok"])

    schema = "media_id bigint, kind string, ok boolean"
    return clips.mapInPandas(gen_a, schema).unionByName(videos.mapInPandas(gen_v, schema))
