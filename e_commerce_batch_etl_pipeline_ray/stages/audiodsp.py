"""Log-mel spectrogram features in pure numpy — the standard audio
featurization a large-scale training-data pipeline feeds to models
(Whisper/wav2vec-style front end), implementable from first principles
with no DSP library: STFT = strided framing x Hann window x rFFT; mel
filterbank = triangular filters on the HTK mel scale
(m = 2595*log10(1 + f/700)); features = log(power @ filters).

Everything is vectorized: framing is a zero-copy
``sliding_window_view`` slice, the window multiply / rFFT / filterbank
matmul operate on the whole (frames, n_fft) matrix at once, and pooling
is two axis-reductions. Per-clip work is O(frames * n_fft log n_fft).

Scale shape: this module is the pure kernel; the Ray stage
(multimodal.AudioFeatures) runs it inside an actor-pool ``map_batches``
where the filterbank is built ONCE per actor in ``__init__`` (it depends
only on (rate, n_fft, n_mels), cached per rate) — clips stream through as
Arrow binary batches, features leave as fixed-width list<float32>.

Reference lineage: the reference has no audio path (src/ is tabular
retail); this implements the brief's multimodal feature-extract
requirement over the REAL pure-numpy WAV decode (stages/multimodal.py
decode_wav_bytes).
"""

from __future__ import annotations

import numpy as np

EPS = 1e-10


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(rate: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """(n_fft//2 + 1, n_mels) triangular filter matrix on the HTK mel
    scale. Unnormalized triangles (peak 1.0): adjacent filters overlap so
    every FFT bin strictly between the first and last filter centers has
    total weight exactly 1 (partition of unity — pinned in tests)."""
    if fmax is None:
        fmax = rate / 2.0
    n_bins = n_fft // 2 + 1
    centers_mel = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    centers_hz = mel_to_hz(centers_mel)
    bin_hz = np.arange(n_bins, dtype=np.float64) * rate / n_fft
    fb = np.zeros((n_bins, n_mels), dtype=np.float64)
    for m in range(n_mels):
        lo, mid, hi = centers_hz[m], centers_hz[m + 1], centers_hz[m + 2]
        up = (bin_hz - lo) / max(mid - lo, EPS)
        down = (hi - bin_hz) / max(hi - mid, EPS)
        fb[:, m] = np.clip(np.minimum(up, down), 0.0, 1.0)
    return fb.astype(np.float32)


def frame_signal(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """(n_frames, n_fft) zero-copy strided view; the tail shorter than one
    full frame is dropped (a clip shorter than n_fft gets one zero-padded
    frame so every clip yields >= 1 frame)."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    if len(x) < n_fft:
        pad = np.zeros(n_fft, dtype=np.float32)
        pad[: len(x)] = x
        return pad[None, :]
    return np.lib.stride_tricks.sliding_window_view(x, n_fft)[::hop]


def logmel(x: np.ndarray, rate: int, n_fft: int = 512, hop: int = 256,
           n_mels: int = 32, fb: np.ndarray | None = None) -> np.ndarray:
    """(n_frames, n_mels) float32 log-mel spectrogram of a mono clip.
    Pipeline: strided frames -> Hann window -> |rFFT|^2 -> mel filterbank
    -> log(eps + .). ``fb`` lets the caller reuse a prebuilt filterbank
    (the actor-pool stage builds it once per (rate) in __init__)."""
    frames = frame_signal(x, n_fft, hop)
    window = np.hanning(n_fft).astype(np.float32)
    spec = np.fft.rfft(frames * window, axis=1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)
    if fb is None:
        fb = mel_filterbank(rate, n_fft, n_mels)
    return np.log(EPS + power @ fb)


def pool_stats(feat: np.ndarray) -> np.ndarray:
    """Clip-level embedding: per-band mean then per-band std over frames,
    concatenated — (2 * n_mels,) float32, the standard fixed-width pooling
    for variable-length clips."""
    return np.concatenate([feat.mean(axis=0),
                           feat.std(axis=0)]).astype(np.float32)
