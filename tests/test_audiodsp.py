"""Log-mel audio features (stages/audiodsp.py + multimodal.AudioFeatures).

Covers: filterbank partition-of-unity, framing (count + zero-pad), the
vectorized STFT pipeline vs a naive per-frame loop reference, physical
sanity (a pure sine's energy peaks in the mel band containing it), and
the Ray actor-pool stage end-to-end (layout invariance, schema, PCM16
roundtrip through the real WAV codec)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from e_commerce_batch_etl_pipeline_ray.stages import audiodsp, multimodal


def test_filterbank_partition_of_unity():
    rate, n_fft, n_mels = 16000, 512, 32
    fb = audiodsp.mel_filterbank(rate, n_fft, n_mels)
    assert fb.shape == (n_fft // 2 + 1, n_mels)
    centers = audiodsp.mel_to_hz(
        np.linspace(audiodsp.hz_to_mel(0.0), audiodsp.hz_to_mel(rate / 2),
                    n_mels + 2))
    bin_hz = np.arange(n_fft // 2 + 1) * rate / n_fft
    interior = (bin_hz > centers[1]) & (bin_hz < centers[-2])
    sums = fb.sum(axis=1)
    assert np.allclose(sums[interior], 1.0, atol=1e-5)
    assert (sums <= 1.0 + 1e-5).all()


def test_framing_count_and_padding():
    n_fft, hop = 64, 32
    x = np.arange(200, dtype=np.float32)
    frames = audiodsp.frame_signal(x, n_fft, hop)
    assert frames.shape == ((200 - n_fft) // hop + 1, n_fft)
    assert (frames[1] == x[hop:hop + n_fft]).all()
    short = audiodsp.frame_signal(np.ones(10, np.float32), n_fft, hop)
    assert short.shape == (1, n_fft)
    assert short[0, :10].sum() == 10 and short[0, 10:].sum() == 0


def test_logmel_matches_naive_loop():
    rng = np.random.RandomState(7)
    x = rng.randn(1000).astype(np.float32)
    rate, n_fft, hop, n_mels = 8000, 128, 64, 16
    got = audiodsp.logmel(x, rate, n_fft, hop, n_mels)
    fb = audiodsp.mel_filterbank(rate, n_fft, n_mels)
    w = np.hanning(n_fft).astype(np.float32)
    ref = []
    for s in range(0, len(x) - n_fft + 1, hop):
        spec = np.fft.rfft(x[s:s + n_fft] * w)
        ref.append(np.log(audiodsp.EPS + (np.abs(spec) ** 2) @ fb))
    ref = np.asarray(ref, dtype=np.float32)
    assert got.shape == ref.shape
    assert np.allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_sine_peaks_in_its_mel_band():
    rate, n_fft, n_mels, f = 16000, 512, 32, 1000.0
    t = np.arange(rate // 2) / rate
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    feat = audiodsp.logmel(x, rate, n_fft, n_fft // 2, n_mels)
    centers = audiodsp.mel_to_hz(
        np.linspace(audiodsp.hz_to_mel(0.0), audiodsp.hz_to_mel(rate / 2),
                    n_mels + 2))[1:-1]
    expected_band = int(np.argmin(np.abs(centers - f)))
    assert int(np.argmax(feat.mean(axis=0))) == expected_band


def test_audio_features_stage_layout_invariant():
    table = multimodal.real_audio_table(24, seed=3)

    def run(blocks: int):
        ds = ray.data.from_arrow(table).repartition(blocks)
        ds = multimodal.audio_features(concurrency=(1, 2)).apply(ds)
        return {r["media_id"]: r for r in ds.take_all()}

    a, b = run(1), run(4)
    assert set(a) == set(b) == set(range(24))
    for i in a:
        assert a[i]["audio_embedding"] == b[i]["audio_embedding"]
        assert len(a[i]["audio_embedding"]) == 2 * 24
        assert a[i]["n_frames"] >= 1
        # encode_wav wrote dur seconds at the clip's rate
        assert 150 <= a[i]["duration_ms"] <= 550
    # spectral diversity: distinct clips get distinct embeddings
    embs = {tuple(r["audio_embedding"]) for r in a.values()}
    assert len(embs) == 24
