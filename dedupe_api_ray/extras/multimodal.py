"""Multimodal column plumbing (driver-brief addition).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata columns alongside (media_type, width/height or sample_rate,
n_bytes).  The decode / feature-extract / resize / frame-sample
kernels require codec libraries that are NOT in this sandbox, so the
decode step is STUBBED: by default it raises NotImplementedError; with
``fake=True`` it produces a deterministic fake decode (hash-derived
pixels/samples) so the Ray-side plumbing — schema, batch sizing, actor
pool signature, output layout — is real and testable.

Scale notes (the part that matters at 100 TB): large binary payloads
mean SMALL ``batch_size`` (bytes per batch ≈ batch_size × payload) and
one actor per CPU with its codec state built in ``__init__``; outputs
are fixed-width feature vectors (list<float>) that downstream ANN /
dedup stages consume.
"""

from __future__ import annotations

import hashlib

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


class MediaDecoder:
    """Actor-pool decode / feature-extract stage.

    Real deployments plug a codec in ``__init__`` (model load happens
    once per actor); this sandbox has none, so ``fake=False`` raises
    NotImplementedError at the decode call — clearly marking the stub —
    while ``fake=True`` derives a deterministic feature vector from the
    payload hash (stable across runs/parallelism)."""

    FEATURE_DIM = 8  # blake2b digest caps at 64 bytes = 8 uint64 lanes

    def __init__(self, fake: bool = False):
        self.fake = fake
        # real impl: self.codec = load_codec(); self.model = load_model()

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media decode requires codec libraries not present in "
                "this environment; pass fake=True for the deterministic "
                "test double")
        h = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM * 8).digest()
        vec = np.frombuffer(h, dtype=np.uint64).astype(np.float64)
        return vec / np.float64(1 << 64)

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
