"""Multimodal (image/audio/video) columns: opaque binary + typed metadata.

The container ships no media libraries, so the BYTE-level codecs here
are the engine's own (grayscale PNG / f32 / q16 tiles and the pure-
numpy baseline JPEG, kernels/codecs.py + kernels/jpeg_codec.py); the
remaining video/audio decoders are STUBS raising NotImplementedError
with the library that would provide them — while the Ray-side plumbing
(schema, actor-pool signature, batch sizing, output layout) is real
and tested.

Stages:
- ``decode_image``  — actor pool: bytes+fmt → (h, w) pixels → features.
  Real for png/f32/q16/i8, tile-jpeg ('jpeg': lo/scale header + JFIF)
  and raw baseline .jpg files ('jfif'); stub for webp.
- ``resize_image``  — block-mean resize (pure NumPy, real) to a target
  (h, w); re-encodes via a real codec.
- ``sample_frames`` — video frame sampling: REAL for MJPEG AVI (RIFF
  walk + baseline JPEG frames, kernels/riff_codec.py); rows without a
  ``bytes`` column use the deterministic fake (seeded noise keyed by
  (video_id, frame_idx)) behind ``fake=True`` or a stub otherwise —
  inter-frame codecs (H.264 & co) still need ffmpeg/pyav.
- ``audio_features``— REAL for WAV (PCM 8/16/24/32-bit + IEEE float):
  per-clip duration/RMS/zero-crossings/peak + windowed RMS aggregate;
  compressed audio (MP3/AAC) raises naming the missing library.

Batch sizes default SMALL (large binary payloads — ray_guide
"Memory-aware": batch × concurrency must fit the worker heap).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..kernels import codecs

_REAL_FMTS = {"png", "f32", "q16", "i8", "jpeg", "jfif"}


def _decode_any(b: bytes, f: str) -> np.ndarray:
    """Tile codecs + raw baseline JFIF files ('jfif': bare .jpg bytes,
    no tile header; RGB collapses to luminance for the feature path)."""
    if f == "jfif":
        from ..kernels import jpeg_codec

        px = jpeg_codec.jpeg_decode(b).astype(np.float64)
        if px.ndim == 3:
            px = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
        return px
    return codecs.decode_tile(b, f)


class DecodeImage:
    """bytes+fmt → pixel features (min/max/mean/std + phash)."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels import phash

        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        n = len(blobs)
        mn = np.full(n, np.nan)
        mx = np.full(n, np.nan)
        mean = np.full(n, np.nan)
        std = np.full(n, np.nan)
        ph = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i, (b, f) in enumerate(zip(blobs, fmts)):
            if f not in _REAL_FMTS:
                if self.strict:
                    raise NotImplementedError(
                        f"decode for fmt={f!r} needs an image library not present "
                        "in this container (PIL/cv2); real codecs: "
                        "png/f32/q16/i8/jpeg/jfif"
                    )
                continue
            try:
                g = _decode_any(b, f)
            except Exception:
                if self.strict:
                    raise
                continue  # corrupt payload: leave marked undecoded
            mn[i], mx[i], mean[i], std[i] = g.min(), g.max(), g.mean(), g.std()
            ph[i] = phash.phash64(g)
            ok[i] = True
        return (
            batch.append_column("px_min", pa.array(mn))
            .append_column("px_max", pa.array(mx))
            .append_column("px_mean", pa.array(mean))
            .append_column("px_std", pa.array(std))
            .append_column("phash_check", pa.array(ph, pa.int64()))
            .append_column("decoded", pa.array(ok))
        )


class ResizeImage:
    """Block-mean resize to (out_h, out_w); real for engine codecs."""

    def __init__(self, out_h: int, out_w: int, out_fmt: str = "q16"):
        self.out_h = out_h
        self.out_w = out_w
        self.out_fmt = out_fmt

    def _resize(self, g: np.ndarray) -> np.ndarray:
        h, w = g.shape
        ri = (np.arange(h) * self.out_h) // h
        ci = (np.arange(w) * self.out_w) // w
        out = np.zeros((self.out_h, self.out_w))
        cnt = np.zeros((self.out_h, self.out_w))
        np.add.at(out, (ri[:, None].repeat(w, 1), ci[None, :].repeat(h, 0)), g)
        np.add.at(cnt, (ri[:, None].repeat(w, 1), ci[None, :].repeat(h, 0)), 1.0)
        return out / np.maximum(cnt, 1.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        out_b: list[bytes] = []
        for b, f in zip(blobs, fmts):
            if f not in _REAL_FMTS:
                raise NotImplementedError(f"resize needs decode for fmt={f!r} (stubbed)")
            out_b.append(codecs.encode_tile(self._resize(_decode_any(b, f)), self.out_fmt))
        t = batch.set_column(batch.schema.get_field_index("bytes"), "bytes", pa.array(out_b, pa.binary()))
        t = t.set_column(t.schema.get_field_index("fmt"), "fmt", pa.array([self.out_fmt] * t.num_rows))
        t = t.set_column(t.schema.get_field_index("w"), "w", pa.array([self.out_w] * t.num_rows, pa.int32()))
        return t.set_column(t.schema.get_field_index("h"), "h", pa.array([self.out_h] * t.num_rows, pa.int32()))


class AudioFeatures:
    """bytes (WAV) → per-clip windowed features: duration, RMS,
    zero-crossing rate, peak, plus per-window RMS aggregates. The WAV
    parse (PCM 8/16/24/32-bit + IEEE float, RIFF walk) is REAL
    (kernels/riff_codec.py); compressed audio raises with the missing
    library named."""

    def __init__(self, window_s: float = 0.5):
        self.window_s = window_s

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels import riff_codec

        blobs = batch["bytes"].to_pylist()
        n = len(blobs)
        dur = np.full(n, np.nan)
        rms = np.full(n, np.nan)
        zcr = np.full(n, np.nan)
        peak = np.full(n, np.nan)
        wmax = np.full(n, np.nan)
        ok = np.zeros(n, dtype=bool)
        for i, b in enumerate(blobs):
            try:
                x, rate = riff_codec.parse_wav(b)
            except NotImplementedError:
                raise
            except Exception:
                continue
            if not len(x):
                continue
            dur[i] = len(x) / rate
            rms[i] = float(np.sqrt(np.mean(x * x)))
            zcr[i] = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
            peak[i] = float(np.abs(x).max())
            win = max(1, int(self.window_s * rate))
            nw = len(x) // win
            if nw:
                w = x[: nw * win].reshape(nw, win)
                wmax[i] = float(np.sqrt((w * w).mean(axis=1)).max())
            else:
                wmax[i] = rms[i]
            ok[i] = True
        return (
            batch.append_column("duration_s", pa.array(np.round(dur, 6)))
            .append_column("rms", pa.array(np.round(rms, 6)))
            .append_column("zcr", pa.array(np.round(zcr, 6)))
            .append_column("peak", pa.array(np.round(peak, 6)))
            .append_column("window_rms_max", pa.array(np.round(wmax, 6)))
            .append_column("decoded", pa.array(ok))
        )


class SampleFrames:
    """Video frame-sampling: emit one row per sampled frame.

    Three modes: ``fake=True`` produces deterministic per-frame pixel
    stats keyed by (video_id, frame_idx); rows with a ``bytes`` column
    holding an MJPEG AVI decode for REAL (RIFF walk + the pure-numpy
    baseline JPEG codec); anything else raises naming the library
    (ffmpeg/pyav) that would provide inter-frame codecs."""

    def __init__(self, every_n: int = 10, fake: bool = True):
        self.every_n = every_n
        self.fake = fake

    def _decode_frame(self, video_id: str, frame_idx: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError("video decode needs ffmpeg/pyav (not in container)")
        seed = int.from_bytes(hashlib.md5(f"{video_id}:{frame_idx}".encode()).digest()[:4], "little")
        return np.random.RandomState(seed).uniform(0, 255, (16, 16))

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["video_id"].to_pylist()
        out_v, out_f, out_mean = [], [], []
        if "bytes" in batch.schema.names:  # real MJPEG AVI path
            from ..kernels import jpeg_codec, riff_codec

            for vid, blob in zip(vids, batch["bytes"].to_pylist()):
                frames = riff_codec.parse_avi_mjpeg(blob)
                for fi in range(0, len(frames), self.every_n):
                    px = jpeg_codec.jpeg_decode(frames[fi]).astype(np.float64)
                    out_v.append(vid)
                    out_f.append(fi)
                    out_mean.append(float(px.mean()))
            return pa.table(
                {
                    "video_id": pa.array(out_v, pa.string()),
                    "frame_idx": pa.array(out_f, pa.int64()),
                    "frame_mean": pa.array(np.round(out_mean, 6)),
                }
            )
        n_frames = batch["n_frames"].to_numpy(zero_copy_only=False)
        for vid, nf in zip(vids, n_frames):
            for fi in range(0, int(nf), self.every_n):
                frame = self._decode_frame(vid, fi)
                out_v.append(vid)
                out_f.append(fi)
                out_mean.append(float(frame.mean()))
        return pa.table(
            {
                "video_id": pa.array(out_v, pa.string()),
                "frame_idx": pa.array(out_f, pa.int64()),
                "frame_mean": pa.array(np.round(out_mean, 6)),
            }
        )


def decode_images(ds, strict: bool = False, concurrency=(1, 8), batch_size: int = 32):
    return ds.map_batches(
        DecodeImage,
        fn_constructor_args=(strict,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_images(ds, out_h: int, out_w: int, concurrency=(1, 8), batch_size: int = 16):
    return ds.map_batches(
        ResizeImage,
        fn_constructor_args=(out_h, out_w),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds, every_n: int = 10, fake: bool = True, concurrency=(1, 4)):
    return ds.map_batches(
        SampleFrames,
        fn_constructor_args=(every_n, fake),
        batch_format="pyarrow",
        batch_size=8,
        concurrency=concurrency,
    )


def audio_features(ds, window_s: float = 0.5, concurrency=(1, 4), batch_size: int = 16):
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_args=(window_s,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
