"""Multimodal column plumbing (engine brief): image/audio/video as opaque
``binary`` columns with typed metadata, processed by actor-pool map_batches
stages.

The decode kernels themselves are STUBBED (image/audio libraries are not in
this container): ``DecodeImage`` / ``SampleFrames`` raise
NotImplementedError unless constructed with ``fake=True``, in which case a
deterministic fake decoder (header-derived dimensions, checksum features)
exercises the real Ray-side plumbing — schema, small-batch sizing for wide
binary rows, actor signature, output layout — which IS tested.

Scale notes: binary payloads make rows wide; callers must use small
``batch_size`` (e.g. 64-256) so batch x concurrency fits worker heap, and
keep everything in Arrow (pandas object columns would copy).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from e_commerce_batch_etl_pipeline_ray.core import FnStep

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),       # image | audio | video
    ("payload", pa.binary()),          # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),             # nullable metadata
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def fake_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic opaque payloads for plumbing tests."""
    rng = np.random.RandomState(seed)
    payloads = [rng.randint(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n)]
    types = [["image", "audio", "video"][i % 3] for i in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["application/octet-stream"] * n, pa.string()),
        "width": pa.array([None] * n, pa.int32()),
        "height": pa.array([None] * n, pa.int32()),
        "duration_ms": pa.array([None] * n, pa.int32()),
    })


class DecodeImage:
    """Actor-pool image decode -> (width, height, feature vector).

    Real implementation would load PIL/torchvision in __init__ (once per
    actor). Without the libs: ``fake=True`` derives dimensions and an
    8-dim byte-histogram feature deterministically from the payload;
    ``fake=False`` raises NotImplementedError at construction.
    """

    def __init__(self, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "image decode requires PIL/torchvision (not in this container); "
                "construct with fake=True for plumbing tests")
        self.fake = True

    def __call__(self, t: pa.Table) -> pa.Table:
        widths, heights, feats = [], [], []
        for payload in t["payload"].to_pylist():
            if payload is None:
                widths.append(None)
                heights.append(None)
                feats.append(None)
                continue
            h = hashlib.blake2b(payload, digest_size=8).digest()
            widths.append(64 + h[0] % 192)
            heights.append(64 + h[1] % 192)
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=8, range=(0, 256))
            feats.append((hist / max(1, len(arr))).astype(np.float32).tolist())
        t = t.set_column(t.column_names.index("width"), "width",
                         pa.array(widths, pa.int32()))
        t = t.set_column(t.column_names.index("height"), "height",
                         pa.array(heights, pa.int32()))
        return t.append_column("features", pa.array(feats, pa.list_(pa.float32())))


class DecodeAudio:
    """Actor-pool audio decode -> (duration_ms, spectral feature vector).

    Real implementation would load soundfile/torchaudio in __init__ (once
    per actor). Without the libs: ``fake=True`` derives a duration from the
    payload length and a 16-dim magnitude-spectrum feature from the raw
    bytes (deterministic numpy rFFT); ``fake=False`` raises
    NotImplementedError at construction.
    """

    def __init__(self, fake: bool = False, sample_rate: int = 16_000):
        if not fake:
            raise NotImplementedError(
                "audio decode requires soundfile/torchaudio (not in this "
                "container); construct with fake=True for plumbing tests")
        self.sample_rate = sample_rate

    def __call__(self, t: pa.Table) -> pa.Table:
        durations, feats = [], []
        for payload in t["payload"].to_pylist():
            if payload is None:
                durations.append(None)
                feats.append(None)
                continue
            # fake: bytes as 8-bit samples at sample_rate
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
            arr = (arr - 128.0) / 128.0
            durations.append(int(len(arr) * 1000 / self.sample_rate))
            spec = np.abs(np.fft.rfft(arr))
            # 16 log-spaced band magnitudes, L1-normalized
            bands = np.array_split(spec, 16)
            f = np.array([b.mean() for b in bands], dtype=np.float32)
            s = f.sum()
            feats.append((f / s if s else f).tolist())
        t = t.set_column(t.column_names.index("duration_ms"), "duration_ms",
                         pa.array(durations, pa.int32()))
        return t.append_column("audio_features",
                               pa.array(feats, pa.list_(pa.float32())))


class SampleFrames:
    """Actor-pool video frame sampler stub: emits ``n_frames`` byte-slices
    per video row (flat_map layout: one output row per frame)."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "video decode requires ffmpeg/av (not in this container); "
                "construct with fake=True for plumbing tests")
        self.n_frames = n_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frame_no, frame_bytes = [], [], []
        for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            if payload is None:
                continue
            step = max(1, len(payload) // self.n_frames)
            for fi in range(self.n_frames):
                ids.append(mid)
                frame_no.append(fi)
                frame_bytes.append(payload[fi * step:(fi + 1) * step])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_no": pa.array(frame_no, pa.int32()),
            "frame": pa.array(frame_bytes, pa.binary()),
        })


def decode_images(fake: bool = False, batch_size: int = 128,
                  concurrency: tuple[int, int] = (1, 4)) -> FnStep:
    """Wide-binary-row stage: note the SMALL batch_size."""
    def _apply(ds):
        return ds.map_batches(DecodeImage, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size,
                              fn_constructor_kwargs={"fake": fake},
                              concurrency=concurrency)
    return FnStep("decode_images", _apply)


def decode_audio(fake: bool = False, batch_size: int = 128,
                 concurrency: tuple[int, int] = (1, 4)) -> FnStep:
    def _apply(ds):
        return ds.map_batches(DecodeAudio, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size,
                              fn_constructor_kwargs={"fake": fake},
                              concurrency=concurrency)
    return FnStep("decode_audio", _apply)


def sample_frames(n_frames: int = 4, fake: bool = False, batch_size: int = 64,
                  concurrency: tuple[int, int] = (1, 4)) -> FnStep:
    def _apply(ds):
        return ds.map_batches(SampleFrames, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size,
                              fn_constructor_kwargs={"n_frames": n_frames,
                                                     "fake": fake},
                              concurrency=concurrency)
    return FnStep("sample_frames", _apply)
