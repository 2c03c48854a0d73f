"""RIFF codecs (kernels/riff_codec.py): WAV parse/write round trips,
MJPEG AVI frame extraction, and the real audio/video stages."""
import struct

import numpy as np
import pyarrow as pa
import pytest

from whitebox_tools_ray.kernels import riff_codec as R
from whitebox_tools_ray.kernels.jpeg_codec import jpeg_encode


@pytest.fixture
def tone():
    rate = 8000
    t = np.arange(rate * 2) / rate  # 2 s
    return 0.5 * np.sin(2 * np.pi * 440 * t), rate


class TestWav:
    def test_pcm16_round_trip(self, tone):
        x, rate = tone
        back, r2 = R.parse_wav(R.write_wav(x, rate, bits=16))
        assert r2 == rate and len(back) == len(x)
        assert np.abs(back - x).max() < 1 / 32000  # 16-bit quantization

    def test_float32_round_trip(self, tone):
        x, rate = tone
        back, r2 = R.parse_wav(R.write_wav(x, rate, bits=32))
        np.testing.assert_allclose(back, x, atol=1e-7)

    def test_stereo_mixdown_and_24bit(self):
        # hand-build a 24-bit stereo WAV: L = +0.5, R = -0.5 -> mono 0
        n = 100
        l = int(0.5 * (1 << 23))
        frames = b""
        for _ in range(n):
            for v in (l, -l):
                frames += struct.pack("<i", v)[:3]
        fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 6, 6, 24)
        body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        body += b"data" + struct.pack("<I", len(frames)) + frames
        buf = b"RIFF" + struct.pack("<I", len(body)) + body
        x, rate = R.parse_wav(buf)
        assert rate == 8000 and len(x) == n
        assert np.abs(x).max() < 1e-6  # perfect cancellation

    def test_compressed_raises_named_library(self):
        fmt = struct.pack("<HHIIHH", 85, 1, 44100, 0, 0, 0)  # 85 = MP3
        body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
        buf = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(NotImplementedError):
            R.parse_wav(buf)


class TestAviMjpeg:
    def _frames(self, k=5):
        rng = np.random.default_rng(2)
        return [
            jpeg_encode((rng.uniform(0, 255, (16, 16))).astype(np.uint8), 90)
            for _ in range(k)
        ]

    def test_round_trip(self):
        frames = self._frames(5)
        avi = R.write_avi_mjpeg(frames, 16, 16, fps=10)
        back = R.parse_avi_mjpeg(avi)
        assert back == frames  # byte-exact container round trip

    def test_non_mjpeg_rejected(self):
        avi = R.write_avi_mjpeg([b"\x00\x01notjpeg"], 16, 16)
        with pytest.raises(ValueError):
            R.parse_avi_mjpeg(avi)


class TestStages:
    def test_audio_features_stage(self, ray_session, tone):
        import ray.data as rd

        from whitebox_tools_ray.stages.multimodal import audio_features

        x, rate = tone
        quiet = x * 0.01
        t = pa.table(
            {
                "clip_id": pa.array([0, 1], pa.int64()),
                "bytes": pa.array(
                    [R.write_wav(x, rate), R.write_wav(quiet, rate)], pa.binary()
                ),
            }
        )
        out = audio_features(rd.from_arrow(t)).to_pandas().sort_values("clip_id")
        assert out["decoded"].all()
        assert abs(out["duration_s"].iloc[0] - 2.0) < 1e-6
        # sine RMS = amp/sqrt(2)
        assert abs(out["rms"].iloc[0] - 0.5 / np.sqrt(2)) < 1e-3
        assert out["rms"].iloc[1] < out["rms"].iloc[0] / 10
        # 440 Hz tone: ~880 sign flips/s -> zcr ~ 0.11 at 8 kHz
        assert 0.08 < out["zcr"].iloc[0] < 0.15

    def test_sample_frames_real_mjpeg(self, ray_session):
        import ray.data as rd

        from whitebox_tools_ray.stages.multimodal import sample_frames

        imgs = [
            np.full((8, 8), v, dtype=np.uint8) for v in (10, 100, 200, 30, 60)
        ]
        avi = R.write_avi_mjpeg([jpeg_encode(im, 95) for im in imgs], 8, 8)
        t = pa.table(
            {"video_id": pa.array(["v1"]), "bytes": pa.array([avi], pa.binary())}
        )
        out = sample_frames(rd.from_arrow(t), every_n=2).to_pandas()
        assert sorted(out["frame_idx"]) == [0, 2, 4]
        by_idx = dict(zip(out["frame_idx"], out["frame_mean"]))
        for fi, v in [(0, 10), (2, 200), (4, 60)]:
            assert abs(by_idx[fi] - v) <= 3, (fi, by_idx[fi], v)
