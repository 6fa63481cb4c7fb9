"""Multimodal payload tests: codec round trips, feature math vs direct
numpy, frame sampling shape, and the real-codec seam markers."""

import numpy as np
import pytest

from osmquadtree_spark.operators.media import audio_features, video_frame_sample
from osmquadtree_spark.sources import media as m


def test_audio_roundtrip():
    s = m.samples_for(7, 1600)
    sr, back = m.decode_audio(m.encode_audio(s, 16000))
    assert sr == 16000
    assert np.array_equal(back, s)


def test_video_roundtrip():
    fr = m.frames_for(11, 48, 32, 5)
    fps, back = m.decode_video(m.encode_video(fr, 15))
    assert fps == 15
    assert np.array_equal(back, fr)


def test_real_codec_seams():
    with pytest.raises(NotImplementedError):
        m.decode_audio_real(b"")
    with pytest.raises(NotImplementedError):
        m.decode_video_real(b"")


def test_audio_features_match_numpy(spark):
    clips = m.audio_df(spark, 12, partitions=3)
    got = {r.clip_id: r for r in audio_features(clips).collect()}
    assert len(got) == 12
    for i in range(12):
        sr = m._SR_CYCLE[i % 4]
        ns = m._LEN_CYCLE[(i // 4) % 4]
        s = m.samples_for(i, ns)
        r = got[i]
        assert r.duration_ms == ns * 1000 // sr
        assert r.peak == int(np.abs(s.astype(np.int32)).max())
        assert r.rms_x1000 == int(np.sqrt(np.mean(s.astype(np.float64) ** 2)) * 1000)
        assert r.zero_crossings == int(((s[:-1].astype(np.int32) * s[1:]) < 0).sum())


def test_video_frame_sample(spark):
    vids = m.video_df(spark, 8, partitions=2)
    rows = video_frame_sample(vids, every=2).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.video_id, []).append(r)
    for i in range(8):
        nf = 4 + i % 5
        w, h = m._VID_WH[i % 4]
        want_idx = list(range(0, nf, 2))
        got = sorted(by_vid[i], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in got] == want_idx
        frames = m.frames_for(i, w, h, nf)
        for r in got:
            f = frames[r.frame_idx]
            assert r.mean_intensity_x100 == int(f.astype(np.int64).sum() * 100 // f.size)
