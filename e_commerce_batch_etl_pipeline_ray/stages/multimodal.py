"""Multimodal column plumbing (engine brief): image/audio/video as opaque
``binary`` columns with typed metadata, processed by actor-pool map_batches
stages.

Decode kernels: REAL pure-numpy decoders — P6 PPM and 24-bit
uncompressed BMP here, PNG (stdlib zlib inflate + all five row filters)
and baseline JPEG (Huffman + IDCT, 4:4:4/4:2:2/4:2:0) in
``stages/imagecodec.py`` — all dispatched by ``decode_image_bytes``
(with nearest-neighbor resize), and PCM16/PCM8 WAV audio
(``decode_wav_bytes``). Formats that genuinely require external
libraries (progressive JPEG, mp3/ogg, ffmpeg video) raise
NotImplementedError per payload with the library named. ``fake=True``
keeps the deterministic fake decoder (header-derived dimensions,
checksum features) for plumbing tests and for corpora of opaque
payloads.

Scale notes: binary payloads make rows wide; callers must use small
``batch_size`` (e.g. 64-256) so batch x concurrency fits worker heap, and
keep everything in Arrow (pandas object columns would copy).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from e_commerce_batch_etl_pipeline_ray.core import FnStep


# ---------------------------------------------------------------------------
# pure-numpy codecs (no PIL/ffmpeg/soundfile in this container)


def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) -> binary P6 PPM."""
    h, w = arr.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + np.ascontiguousarray(
        arr, dtype=np.uint8).tobytes()


def _decode_ppm(b: bytes) -> np.ndarray:
    # tokenizer: magic, width, height, maxval — whitespace-separated, with
    # '#' comments; a single whitespace byte then raster data
    pos, tokens = 0, []
    while len(tokens) < 4:
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos:pos + 1].isspace():
            pos += 1
        tokens.append(b[start:pos])
    pos += 1                                     # the single ws after maxval
    if tokens[0] != b"P6":
        raise ValueError(f"not a P6 PPM: magic {tokens[0]!r}")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    data = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3).copy()


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB -> 24-bit uncompressed bottom-up BMP."""
    h, w = arr.shape[:2]
    row_raw = w * 3
    pad = (4 - row_raw % 4) % 4
    img_size = (row_raw + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    bgr = np.ascontiguousarray(arr[::-1, :, ::-1], dtype=np.uint8)  # bottom-up, BGR
    if pad:
        rows = bgr.reshape(h, row_raw)
        rows = np.concatenate([rows, np.zeros((h, pad), np.uint8)], axis=1)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    return header + info + body


def _decode_bmp(b: bytes) -> np.ndarray:
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if comp != 0 or bpp != 24:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, comp={comp})")
    flip = h > 0                                # positive height = bottom-up
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h,
                         offset=offset).reshape(h, stride)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]       # BGR -> RGB
    return (img[::-1] if flip else img).copy()


def decode_image_bytes(payload: bytes) -> np.ndarray:
    """Decode PPM (P6), BMP (24-bit uncompressed), PNG (8-bit gray /
    RGB / palette / RGBA, non-interlaced) or baseline JPEG to uint8
    (H, W, 3). Alpha composites over white; grayscale replicates to 3
    channels. Remaining formats raise NotImplementedError naming the
    missing library."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from e_commerce_batch_etl_pipeline_ray.stages.imagecodec import (
            decode_png,
        )
        img = decode_png(payload)
        if img.ndim == 2:
            return np.repeat(img[:, :, None], 3, axis=2)
        if img.shape[2] == 2:                 # gray+alpha
            g = np.repeat(img[:, :, :1], 3, axis=2)
            img = np.dstack([g, img[:, :, 1]])
        if img.shape[2] == 4:                 # composite over white
            rgb = img[:, :, :3].astype(np.float64)
            a = img[:, :, 3:4].astype(np.float64) / 255.0
            return (rgb * a + 255.0 * (1 - a)).round().astype(np.uint8)
        return img
    if payload[:2] == b"\xff\xd8":
        from e_commerce_batch_etl_pipeline_ray.stages.imagecodec import (
            decode_jpeg,
        )
        img = decode_jpeg(payload)
        if img.ndim == 2:
            return np.repeat(img[:, :, None], 3, axis=2)
        return img
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from e_commerce_batch_etl_pipeline_ray.stages.imagecodec import (
            decode_gif,
        )
        return decode_gif(payload)[0][0]          # first frame composite
    raise NotImplementedError(
        f"unsupported image format (magic {payload[:4]!r}): PPM/BMP/PNG/"
        "baseline-JPEG/GIF decode in pure numpy; other formats require "
        "PIL (not in this container)")


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (uint8 (H, W, C))."""
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[yi][:, xi]


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """float32 [-1,1] mono -> PCM16 WAV."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE",
                      b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
                      b"data", len(pcm))
    return hdr + pcm


def decode_wav_bytes(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16/PCM8 WAV -> (float32 mono samples in [-1,1], sample_rate).
    Chunk-walks RIFF; compressed codecs -> NotImplementedError."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            f"unsupported audio format (magic {payload[:4]!r}): only PCM "
            "WAV decodes in pure numpy; mp3/ogg/flac require soundfile")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)             # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(f"non-PCM WAV (format {audio_fmt})")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    if n_ch > 1:                                 # downmix to mono
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, rate

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


def real_media_table(n: int, seed: int = 42, max_side: int = 48) -> pa.Table:
    """Deterministic REAL payloads: PPM / BMP / PNG / baseline-JPEG images
    (rotating) plus PCM16 WAV audio every third row — all decodable by the
    pure-numpy kernels. JPEG rows use smooth gradient content (lossy
    format; gradients keep the decode feature-stable across quality)."""
    from e_commerce_batch_etl_pipeline_ray.stages.imagecodec import (
        encode_jpeg,
        encode_png,
    )
    rng = np.random.RandomState(seed)
    ids, types, payloads, mimes, ws, hs, durs = [], [], [], [], [], [], []
    img_i = 0
    for i in range(n):
        ids.append(i)
        if i % 3 == 2:
            rate = 8000
            x = np.sin(np.linspace(0, 20 + i, rate // 4)) * 0.5
            payloads.append(encode_wav(x.astype(np.float32), rate))
            types.append("audio")
            mimes.append("audio/wav")
            ws.append(None)
            hs.append(None)
            durs.append(None)
        else:
            w = int(rng.randint(8, max_side))
            h = int(rng.randint(8, max_side))
            fmt = img_i % 4
            img_i += 1
            if fmt == 3:  # smooth content for the lossy codec
                yy, xx = np.mgrid[0:h, 0:w]
                img = np.stack([(yy * 3) % 256, (xx * 5) % 256,
                                ((yy + xx) * 2) % 256],
                               axis=-1).astype(np.uint8)
            else:
                img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            enc = [encode_ppm, encode_bmp, encode_png, encode_jpeg][fmt]
            payloads.append(enc(img))
            types.append("image")
            mimes.append(["image/x-portable-pixmap", "image/bmp",
                          "image/png", "image/jpeg"][fmt])
            ws.append(None)
            hs.append(None)
            durs.append(None)
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(mimes, pa.string()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "duration_ms": pa.array(durs, pa.int32()),
    })


def real_audio_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic REAL PCM16 WAV clips with varied content: mixed
    rates (8/16 kHz), 1-3 summed sines at seeded frequencies, seeded
    amplitude and length — enough spectral diversity that log-mel
    embeddings separate the clips (tested)."""
    rng = np.random.RandomState(seed)
    ids, payloads, rates, f0s = [], [], [], []
    for i in range(n):
        rate = [8000, 16000][int(rng.randint(2))]
        dur = 0.2 + 0.3 * rng.rand()
        t = np.arange(int(rate * dur)) / rate
        x = np.zeros_like(t, dtype=np.float64)
        n_tones = int(rng.randint(1, 4))
        f0 = None
        for k in range(n_tones):
            f = float(rng.uniform(100, rate / 2 * 0.8))
            if f0 is None or f < f0:
                f0 = f
            x += rng.uniform(0.2, 0.5) * np.sin(2 * np.pi * f * t)
        x /= max(1.0, np.abs(x).max() * 1.1)
        ids.append(i)
        payloads.append(encode_wav(x.astype(np.float32), rate))
        rates.append(rate)
        f0s.append(f0)
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "media_type": pa.array(["audio"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["audio/wav"] * n, pa.string()),
        "sample_rate": pa.array(rates, pa.int32()),
        "f0_hz": pa.array(f0s, pa.float64()),
        "duration_ms": pa.array([None] * n, pa.int32()),
    })


def real_video_table(n: int, seed: int = 42, max_side: int = 32,
                     max_frames: int = 10) -> pa.Table:
    """Deterministic REAL video payloads: animated GIFs (a moving block
    over a flat background, 2..max_frames frames, per-frame delays) —
    decodable end-to-end by the pure-numpy GIF codec, so the frame-
    sampling stage runs for real."""
    from e_commerce_batch_etl_pipeline_ray.stages.imagecodec import (
        encode_gif,
    )
    rng = np.random.RandomState(seed)
    ids, payloads, durs = [], [], []
    for i in range(n):
        w = int(rng.randint(12, max_side))
        h = int(rng.randint(12, max_side))
        nf = int(rng.randint(2, max_frames + 1))
        bg = rng.randint(0, 256, 3).astype(np.uint8)
        fg = rng.randint(0, 256, 3).astype(np.uint8)
        frames = np.tile(bg, (nf, h, w, 1)).astype(np.uint8)
        side = max(2, min(w, h) // 3)
        for fi in range(nf):
            x = (fi * max(1, (w - side))) // max(1, nf - 1)
            y = (fi * max(1, (h - side))) // max(1, nf - 1)
            frames[fi, y:y + side, x:x + side] = fg
        delays = [int(rng.randint(20, 200)) for _ in range(nf)]
        ids.append(i)
        payloads.append(encode_gif(frames, delays))
        durs.append(sum(delays))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "media_type": pa.array(["video"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["image/gif"] * n, pa.string()),
        "width": pa.array([None] * n, pa.int32()),
        "height": pa.array([None] * n, pa.int32()),
        "duration_ms": pa.array(durs, pa.int32()),
    })


class DecodeImage:
    """Actor-pool image decode -> (width, height, feature vector).

    ``fake=False`` (default): REAL pure-numpy decode of PPM/BMP/PNG/
    baseline-JPEG payloads (decode_image_bytes); optional
    ``resize_to=(w, h)`` nearest-neighbor resize before feature
    extraction; features = 8-bin grayscale-pixel histogram,
    L1-normalized. Remaining formats (GIF, progressive JPEG, ...) raise
    NotImplementedError naming the missing library. A PIL-based path
    would slot in here (loaded once per actor in __init__) when the
    container gains it.

    ``fake=True``: deterministic fake decoder (blake2b-derived dimensions,
    byte-histogram features) for plumbing tests / opaque payloads.
    """

    def __init__(self, fake: bool = False,
                 resize_to: tuple[int, int] | None = None):
        self.fake = fake
        self.resize_to = resize_to

    def _decode_real(self, payload: bytes):
        img = decode_image_bytes(payload)
        h, w = img.shape[:2]
        if self.resize_to is not None:
            img = resize_nearest(img, *self.resize_to)
        gray = img.astype(np.float32).mean(axis=2)
        hist, _ = np.histogram(gray, bins=8, range=(0, 256))
        feat = (hist / max(1, gray.size)).astype(np.float32)
        return w, h, feat.tolist()

    def _decode_fake(self, payload: bytes):
        h = hashlib.blake2b(payload, digest_size=8).digest()
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=8, range=(0, 256))
        return (64 + h[0] % 192, 64 + h[1] % 192,
                (hist / max(1, len(arr))).astype(np.float32).tolist())

    def __call__(self, t: pa.Table) -> pa.Table:
        decode = self._decode_fake if self.fake else self._decode_real
        widths, heights, feats = [], [], []
        for payload in t["payload"].to_pylist():
            if payload is None:
                widths.append(None)
                heights.append(None)
                feats.append(None)
                continue
            w, h, f = decode(payload)
            widths.append(w)
            heights.append(h)
            feats.append(f)
        t = t.set_column(t.column_names.index("width"), "width",
                         pa.array(widths, pa.int32()))
        t = t.set_column(t.column_names.index("height"), "height",
                         pa.array(heights, pa.int32()))
        return t.append_column("features", pa.array(feats, pa.list_(pa.float32())))


class DecodeAudio:
    """Actor-pool audio decode -> (duration_ms, spectral feature vector).

    ``fake=False`` (default): REAL pure-numpy PCM WAV decode
    (decode_wav_bytes — header-parsed sample rate, PCM16/PCM8, multi-channel
    downmix); compressed codecs raise NotImplementedError naming soundfile.
    ``fake=True``: payload bytes treated as 8-bit samples at ``sample_rate``
    (plumbing tests / opaque payloads). Features in both modes: 16 band
    magnitudes of the rFFT, L1-normalized.
    """

    def __init__(self, fake: bool = False, sample_rate: int = 16_000):
        self.fake = fake
        self.sample_rate = sample_rate

    @staticmethod
    def _spectral_features(arr: np.ndarray) -> list[float]:
        spec = np.abs(np.fft.rfft(arr))
        bands = np.array_split(spec, 16)
        f = np.array([b.mean() if len(b) else 0.0 for b in bands],
                     dtype=np.float32)
        s = f.sum()
        return (f / s if s else f).tolist()

    def __call__(self, t: pa.Table) -> pa.Table:
        durations, feats = [], []
        for payload in t["payload"].to_pylist():
            if payload is None:
                durations.append(None)
                feats.append(None)
                continue
            if self.fake:
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
                arr = (arr - 128.0) / 128.0
                rate = self.sample_rate
            else:
                arr, rate = decode_wav_bytes(payload)
            durations.append(int(len(arr) * 1000 / rate))
            feats.append(self._spectral_features(arr))
        t = t.set_column(t.column_names.index("duration_ms"), "duration_ms",
                         pa.array(durations, pa.int32()))
        return t.append_column("audio_features",
                               pa.array(feats, pa.list_(pa.float32())))


class SampleFrames:
    """Actor-pool video frame sampler (flat_map layout: one output row
    per frame, ``n_frames`` evenly-spaced frames per video row).

    ``fake=False`` (default): REAL decode for animated GIF payloads —
    the one multi-frame container decodable without external libraries
    (stages/imagecodec.decode_gif); sampled frames are re-encoded as
    PNG bytes so downstream image stages (DecodeImage) compose. Other
    containers (mp4/webm/...) raise NotImplementedError naming ffmpeg —
    an ffmpeg/av path would slot into __init__ when the container
    gains it.

    ``fake=True``: deterministic byte-slice pseudo-frames for plumbing
    tests over opaque payloads."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n_frames = n_frames
        self.fake = fake
        if not fake:
            from e_commerce_batch_etl_pipeline_ray.stages.imagecodec import (
                decode_gif,
                encode_png,
            )
            self._decode_gif, self._encode_png = decode_gif, encode_png

    def _sample(self, payload: bytes) -> list[bytes]:
        if self.fake:
            step = max(1, len(payload) // self.n_frames)
            return [payload[fi * step:(fi + 1) * step]
                    for fi in range(self.n_frames)]
        if payload[:6] not in (b"GIF87a", b"GIF89a"):
            raise NotImplementedError(
                f"video container (magic {payload[:4]!r}) requires "
                "ffmpeg/av (not in this container); animated GIF decodes "
                "for real, or construct with fake=True for plumbing tests")
        frames, _ = self._decode_gif(payload)
        picks = np.unique(np.linspace(0, len(frames) - 1, self.n_frames)
                          .round().astype(np.int64))
        return [self._encode_png(frames[i]) for i in picks]

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frame_no, frame_bytes = [], [], []
        for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            if payload is None:
                continue
            for fi, fb in enumerate(self._sample(payload)):
                ids.append(mid)
                frame_no.append(fi)
                frame_bytes.append(fb)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_no": pa.array(frame_no, pa.int32()),
            "frame": pa.array(frame_bytes, pa.binary()),
        })


class AudioFeatures:
    """Actor-pool log-mel featurizer (stages/audiodsp.py): WAV payload ->
    fixed-width clip embedding (per-mel-band mean + std over the log-mel
    spectrogram, the standard pooling for variable-length clips) plus
    ``n_frames`` and ``duration_ms``.

    Stateful setup lives in the actor: mel filterbanks depend only on
    (sample_rate, n_fft, n_mels) and are built ONCE per rate per actor
    (cached dict), never per batch or per clip. Clips necessarily vary in
    length, so the per-payload loop is the batch grain; all math inside a
    clip is one strided-frame matrix pipeline."""

    def __init__(self, n_fft: int = 256, hop: int = 128, n_mels: int = 24,
                 fake: bool = False, sample_rate: int = 16_000):
        self.n_fft, self.hop, self.n_mels = n_fft, hop, n_mels
        self.fake = fake
        self.sample_rate = sample_rate
        self._fbs: dict[int, np.ndarray] = {}

    def _fb(self, rate: int) -> np.ndarray:
        from e_commerce_batch_etl_pipeline_ray.stages import audiodsp
        if rate not in self._fbs:
            self._fbs[rate] = audiodsp.mel_filterbank(
                rate, self.n_fft, self.n_mels)
        return self._fbs[rate]

    def __call__(self, t: pa.Table) -> pa.Table:
        from e_commerce_batch_etl_pipeline_ray.stages import audiodsp
        durations, frames_n, embs = [], [], []
        for payload in t["payload"].to_pylist():
            if payload is None:
                durations.append(None)
                frames_n.append(None)
                embs.append(None)
                continue
            if self.fake:
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
                arr = (arr - 128.0) / 128.0
                rate = self.sample_rate
            else:
                arr, rate = decode_wav_bytes(payload)
            feat = audiodsp.logmel(arr, rate, self.n_fft, self.hop,
                                   self.n_mels, fb=self._fb(rate))
            durations.append(int(len(arr) * 1000 / rate))
            frames_n.append(feat.shape[0])
            embs.append(audiodsp.pool_stats(feat).tolist())
        if "duration_ms" in t.column_names:
            t = t.set_column(t.column_names.index("duration_ms"),
                             "duration_ms", pa.array(durations, pa.int32()))
        else:
            t = t.append_column("duration_ms", pa.array(durations, pa.int32()))
        t = t.append_column("n_frames", pa.array(frames_n, pa.int32()))
        return t.append_column(
            "audio_embedding", pa.array(embs, pa.list_(pa.float32())))


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


def audio_features(n_fft: int = 256, hop: int = 128, n_mels: int = 24,
                   fake: bool = False, batch_size: int = 128,
                   concurrency: tuple[int, int] = (1, 4)) -> FnStep:
    def _apply(ds):
        return ds.map_batches(AudioFeatures, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size,
                              fn_constructor_kwargs={
                                  "n_fft": n_fft, "hop": hop,
                                  "n_mels": n_mels, "fake": fake},
                              concurrency=concurrency)
    return FnStep("audio_features", _apply)


def sample_frames(n_frames: int = 4, fake: bool = False, batch_size: int = 64,
                  concurrency: tuple[int, int] = (1, 4)) -> FnStep:
    def _apply(ds):
        return ds.map_batches(SampleFrames, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size,
                              fn_constructor_kwargs={"n_frames": n_frames,
                                                     "fake": fake},
                              concurrency=concurrency)
    return FnStep("sample_frames", _apply)
