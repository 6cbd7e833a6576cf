"""Multimodal column plumbing (driver-brief addition).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata columns alongside (media_type, width/height or sample_rate,
n_bytes).

Decode is REAL for every container a clean-room parser can handle
without codec libraries:

- images: PPM (P6) / PGM (P5) / uncompressed 24- and 8-bit BI_RGB BMP
  → ``decode_image`` (numpy HxWxC uint8)
- audio: PCM WAV (8/16/32-bit int, via stdlib ``wave``) →
  ``decode_audio`` (float64 mono in [-1, 1] + sample rate)
- features: channel means/stds + luma histogram (images), RMS /
  zero-crossing / FFT band energies (audio) — fixed-width
  ``list<float>`` vectors that downstream ANN / dedup stages consume
- ``resize_bilinear``: pure-numpy separable bilinear resize

Compressed codecs (PNG/JPEG/MP3/video) are NOT in this sandbox; those
media types raise NotImplementedError at the decode call — the honest
stub is now the exception, not the rule.  ``fake=True`` keeps the
deterministic hash-derived feature double for plumbing tests.

Scale notes (the part that matters at 100 TB): large binary payloads
mean SMALL ``batch_size`` (bytes per batch ≈ batch_size × payload) and
one actor per CPU with its codec state built in ``__init__``; outputs
are fixed-width feature vectors (list<float>).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),   # "image/png", "audio/wav", ...
    ("payload", pa.binary()),
    ("width", pa.int32()),         # images; -1 otherwise
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),   # audio; -1 otherwise
    ("n_bytes", pa.int64()),
])


# ---------------------------------------------------------------------------
# real decoders (clean-room parsers, no codec libraries)
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 → binary PPM (P6).  Used by fixtures and tests."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def encode_pgm(img: np.ndarray) -> bytes:
    """HxW uint8 → binary PGM (P5)."""
    h, w = img.shape
    assert img.dtype == np.uint8
    return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 (RGB) → uncompressed 24-bit BI_RGB BMP
    (bottom-up rows, BGR byte order, 4-byte row padding)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_size = (w * 3 + 3) & ~3
    pix = np.zeros((h, row_size), dtype=np.uint8)
    pix[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = pix.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def _decode_pnm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5), maxval <= 255."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PNM payload: {magic!r}")
    # header: magic, width, height, maxval — whitespace/comment separated
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    ch = 3 if magic == b"P6" else 1
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=pos)
    return arr.reshape((h, w, ch)) if ch == 3 else arr.reshape((h, w))


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed BI_RGB BMP, 24-bit (BGR) or 8-bit (palette)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise NotImplementedError(
            f"compressed BMP (method {compression}) requires a codec "
            "library not present in this environment")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * (bpp // 8) + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * row_size,
                         offset=data_off).reshape(h, row_size)
    if bottom_up:
        rows = rows[::-1]
    if bpp == 24:
        img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
        return np.ascontiguousarray(img)
    if bpp == 8:
        pal_off = 14 + hdr_size
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal = np.frombuffer(payload, dtype=np.uint8, count=n_colors * 4,
                            offset=pal_off).reshape(n_colors, 4)[:, :3][:, ::-1]
        return pal[rows[:, :w]]
    raise NotImplementedError(f"{bpp}-bit BMP not supported")


def decode_image(payload: bytes, media_type: str = "") -> np.ndarray:
    """Real image decode for PPM/PGM/BMP; NotImplementedError for
    compressed codecs (PNG/JPEG/...) absent from this sandbox."""
    if payload[:2] in (b"P6", b"P5"):
        return _decode_pnm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        f"image decode for {media_type or 'unknown container'} requires "
        "codec libraries not present in this environment "
        "(supported here: PPM/PGM/BMP)")


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float64 mono in [-1, 1] → 16-bit PCM WAV."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_audio(payload: bytes, media_type: str = ""
                 ) -> tuple[np.ndarray, int]:
    """Real PCM WAV decode (8/16/32-bit int): → (float64 mono in
    [-1, 1], sample_rate).  Multi-channel is averaged to mono."""
    if payload[:4] != b"RIFF":
        raise NotImplementedError(
            f"audio decode for {media_type or 'unknown container'} "
            "requires codec libraries not present in this environment "
            "(supported here: PCM WAV)")
    with wave.open(io.BytesIO(payload), "rb") as f:
        sw, nch, sr = f.getsampwidth(), f.getnchannels(), f.getframerate()
        raw = f.readframes(f.getnframes())
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"{sw * 8}-bit WAV not supported")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Pure-numpy separable bilinear resize (align_corners=False
    convention, the common ML default).  HxW or HxWxC uint8 → same
    dtype."""
    h, w = img.shape[:2]
    squeeze = img.ndim == 2
    a = img[:, :, None].astype(np.float64) if squeeze \
        else img.astype(np.float64)
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    out = np.clip(np.rint(out), 0, 255).astype(img.dtype)
    return out[:, :, 0] if squeeze else out


_HIST_BINS = 8
IMAGE_FEATURE_DIM = 6 + _HIST_BINS   # mean/std per RGB channel + luma hist
AUDIO_FEATURE_DIM = 2 + _HIST_BINS   # rms + zcr + FFT band energies


def image_features(img: np.ndarray) -> np.ndarray:
    """Fixed-width image descriptor: per-channel mean/std (RGB, scaled
    to [0,1]) + L1-normalized 8-bin luma histogram."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    a = img.astype(np.float64) / 255.0
    means = a.mean(axis=(0, 1))
    stds = a.std(axis=(0, 1))
    luma = a @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=_HIST_BINS, range=(0.0, 1.0))
    hist = hist.astype(np.float64)
    hist /= max(hist.sum(), 1.0)
    return np.concatenate([means, stds, hist])


def audio_features(x: np.ndarray, sr: int) -> np.ndarray:
    """Fixed-width audio descriptor: RMS, zero-crossing rate, and
    L1-normalized energies in 8 linear FFT bands up to Nyquist."""
    n = len(x)
    if n == 0:
        return np.zeros(AUDIO_FEATURE_DIM)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 \
        else 0.0
    spec = np.abs(np.fft.rfft(x)) ** 2
    bands = np.array_split(spec, _HIST_BINS)
    e = np.array([b.sum() for b in bands], dtype=np.float64)
    e /= max(e.sum(), 1e-30)
    return np.concatenate([[rms, zcr], e])


def make_fake_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (binary payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    ids, types, payloads, w, h, sr, nb = [], [], [], [], [], [], []
    for i in range(n):
        kind = ("image/png", "audio/wav")[i % 2]
        size = int(rng.randint(256, 4096))
        payload = hashlib.blake2b(f"{seed}:{i}".encode(),
                                  digest_size=32).digest() * (size // 32 + 1)
        payload = payload[:size]
        ids.append(i)
        types.append(kind)
        payloads.append(payload)
        w.append(int(rng.randint(16, 256)) if kind.startswith("image") else -1)
        h.append(int(rng.randint(16, 256)) if kind.startswith("image") else -1)
        sr.append(16000 if kind.startswith("audio") else -1)
        nb.append(size)
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "media_type": pa.array(types, pa.string()),
                     "payload": pa.array(payloads, pa.binary()),
                     "width": pa.array(w, pa.int32()),
                     "height": pa.array(h, pa.int32()),
                     "sample_rate": pa.array(sr, pa.int32()),
                     "n_bytes": pa.array(nb, pa.int64())})


def make_real_media_table(n: int = 24, seed: int = 42) -> pa.Table:
    """Deterministic REAL media rows: PPM / BMP images (gradient +
    noise pixels) and 16-bit PCM WAV tones, round 3 containers."""
    rng = np.random.RandomState(seed)
    ids, types, payloads, w, h, sr, nb = [], [], [], [], [], [], []
    for i in range(n):
        kind = ("image/x-portable-pixmap", "image/bmp", "audio/wav")[i % 3]
        if kind.startswith("image"):
            hh, ww = int(rng.randint(8, 48)), int(rng.randint(8, 48))
            img = (rng.randint(0, 256, size=(hh, ww, 3))).astype(np.uint8)
            payload = encode_ppm(img) if kind.endswith("pixmap") \
                else encode_bmp(img)
            w.append(ww); h.append(hh); sr.append(-1)
        else:
            rate = 8000
            t = np.arange(int(rng.randint(400, 2000))) / rate
            freq = float(rng.randint(100, 1500))
            payload = encode_wav(0.5 * np.sin(2 * np.pi * freq * t), rate)
            w.append(-1); h.append(-1); sr.append(rate)
        ids.append(i)
        types.append(kind)
        payloads.append(payload)
        nb.append(len(payload))
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "media_type": pa.array(types, pa.string()),
                     "payload": pa.array(payloads, pa.binary()),
                     "width": pa.array(w, pa.int32()),
                     "height": pa.array(h, pa.int32()),
                     "sample_rate": pa.array(sr, pa.int32()),
                     "n_bytes": pa.array(nb, pa.int64())})


class MediaDecoder:
    """Actor-pool decode / feature-extract stage.

    ``fake=False`` (default) REALLY decodes PPM/PGM/BMP images and PCM
    WAV audio (clean-room parsers above) and emits the fixed-width
    descriptor for the modality; compressed codecs raise
    NotImplementedError (absent from this sandbox).  ``fake=True``
    derives a deterministic feature vector from the payload hash —
    the plumbing test double (stable across runs/parallelism).
    Real deployments additionally plug a learned model in ``__init__``
    (loaded once per actor)."""

    FEATURE_DIM = 8  # fake mode: blake2b 64 bytes = 8 uint64 lanes

    def __init__(self, fake: bool = False):
        self.fake = fake
        # real impl would also: self.model = load_model()

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.fake:
            h = hashlib.blake2b(payload,
                                digest_size=self.FEATURE_DIM * 8).digest()
            vec = np.frombuffer(h, dtype=np.uint64).astype(np.float64)
            return vec / np.float64(1 << 64)
        # Branch on the DECLARED media_type first: RIFF is a generic
        # container (WAV audio but also WebP images), so sniffing
        # payload[:4] == b'RIFF' before checking the type routed
        # image/webp into the WAV parser and leaked a raw wave.Error.
        try:
            if media_type.startswith("audio"):
                x, sr = decode_audio(payload, media_type)
                return audio_features(x, sr)
            if media_type.startswith("image"):
                img = decode_image(payload, media_type)
                return image_features(img)
            # unknown/unspecified type: sniff, audio only for RIFF/WAVE
            if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                x, sr = decode_audio(payload, media_type)
                return audio_features(x, sr)
            img = decode_image(payload, media_type)
            return image_features(img)
        except wave.Error as e:
            raise NotImplementedError(
                f"decode for media_type={media_type or 'unknown'!r} "
                f"failed in the WAV parser ({e}); compressed/containered "
                "codecs need libraries absent from this environment"
            ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p, t) for p, t in
                 zip(batch["payload"].to_pylist(),
                     batch["media_type"].to_pylist())]
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float64())),
        })


def extract_media_features(media: ray.data.Dataset, fake: bool = False,
                           batch_size: int = 64,
                           concurrency: int | tuple = (1, 8)
                           ) -> ray.data.Dataset:
    """media table → (media_id, media_type, feature list<float>).
    Small batch_size: payload bytes × batch_size must fit the worker
    heap (the large-binary rule)."""
    return media.map_batches(
        MediaDecoder, fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def frame_sample(media: ray.data.Dataset, every_n_bytes: int = 1024,
                 max_frames: int = 8) -> ray.data.Dataset:
    """'Frame sampling' over opaque payloads: emit byte-window rows
    (media_id, frame_idx, frame_bytes).  Real video frame extraction is
    stubbed the same way as decode; the explode shape (one in-row →
    many out-rows) is the real plumbing being exercised."""
    def fn(batch: pa.Table) -> pa.Table:
        out_id, out_idx, out_frame = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            for k in range(min(max_frames,
                               max(1, len(payload) // every_n_bytes))):
                out_id.append(mid)
                out_idx.append(k)
                out_frame.append(payload[k * every_n_bytes:
                                         (k + 1) * every_n_bytes])
        return pa.table({"media_id": pa.array(out_id, pa.int64()),
                         "frame_idx": pa.array(out_idx, pa.int32()),
                         "frame_bytes": pa.array(out_frame, pa.binary())})

    return media.map_batches(fn, batch_format="pyarrow", batch_size=32)
