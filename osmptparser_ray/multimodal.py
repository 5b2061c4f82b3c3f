"""Multimodal (image/audio/video) column plumbing — real Ray-side, stubbed codec.

Media travels as opaque ``binary`` columns with typed metadata
(media_type, width/height or sample_rate, n_bytes). The decode /
feature-extract stages are actor-pool ``map_batches`` classes whose Ray
plumbing (schema, batch sizing, actor signature, output layout) is real
and tested; the actual codec call is isolated behind ``_decode_image`` /
``_decode_audio`` which raise ``NotImplementedError`` unless
``fake=True`` (deterministic fake: byte-hash-seeded arrays) — the
image/audio libraries are not available in this container.

Batch-size guidance: media rows are wide — keep ``batch_size`` small
(``MEDIA_BATCH_SIZE``) so batch × concurrency fits worker heaps, and rely
on the object store to spill blocks.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from .util import default_actor_concurrency

MEDIA_BATCH_SIZE = 16

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media_type", pa.string()),  # 'image/png', 'audio/wav', ...
        pa.field("payload", pa.binary()),
        pa.field("meta_width", pa.int32()),
        pa.field("meta_height", pa.int32()),
        pa.field("meta_sample_rate", pa.int32()),
        pa.field("n_bytes", pa.int64()),
    ]
)


def _fake_seed(payload: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")


def _decode_image(payload: bytes, width: int, height: int, fake: bool) -> np.ndarray:
    """→ (H, W, 3) uint8. STUB: real codec (PIL/cv2) unavailable here."""
    if not fake:
        raise NotImplementedError("image codec not available in this container; use fake=True")
    rng = np.random.default_rng(_fake_seed(payload))
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def _decode_audio(payload: bytes, sample_rate: int, fake: bool) -> np.ndarray:
    """→ (n_samples,) float32. STUB: real codec unavailable here."""
    if not fake:
        raise NotImplementedError("audio codec not available in this container; use fake=True")
    rng = np.random.default_rng(_fake_seed(payload))
    return rng.standard_normal(sample_rate, dtype=np.float32)


class ImageFeatureExtractor:
    """Actor-pool stage: decode → resize (area mean-pool) → channel stats.

    Output: media_id, feat_mean_r/g/b (float64), out_w, out_h.
    """

    def __init__(self, out_size: int = 32, fake: bool = True):
        self.out_size = out_size
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        ws = batch["meta_width"].to_pylist()
        hs = batch["meta_height"].to_pylist()
        means = np.zeros((len(ids), 3), dtype=np.float64)
        for i, (p, w, h) in enumerate(zip(payloads, ws, hs)):
            img = _decode_image(p, w, h, self.fake)
            # mean-pool resize to out_size×out_size (vectorized reshape-mean
            # when divisible, else crop to the largest divisible region)
            s = self.out_size
            ch, cw = (h // s) * s, (w // s) * s
            img = img[:ch, :cw]
            pooled = img.reshape(s, ch // s, s, cw // s, 3).mean(axis=(1, 3))
            means[i] = pooled.mean(axis=(0, 1))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "feat_mean_r": pa.array(means[:, 0], pa.float64()),
                "feat_mean_g": pa.array(means[:, 1], pa.float64()),
                "feat_mean_b": pa.array(means[:, 2], pa.float64()),
                "out_w": pa.array([self.out_size] * len(ids), pa.int32()),
                "out_h": pa.array([self.out_size] * len(ids), pa.int32()),
            }
        )


class AudioFrameSampler:
    """Actor-pool stage: decode → frame-sample → per-frame RMS energy.

    Output: one row per (media_id, frame_idx) with rms:float64.
    """

    def __init__(self, frame_len: int = 1024, max_frames: int = 8, fake: bool = True):
        self.frame_len = frame_len
        self.max_frames = max_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_frame, out_rms = [], [], []
        for mid, p, sr in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["meta_sample_rate"].to_pylist(),
        ):
            wave = _decode_audio(p, sr, self.fake)
            n = min(self.max_frames, len(wave) // self.frame_len)
            frames = wave[: n * self.frame_len].reshape(n, self.frame_len)
            rms = np.sqrt((frames.astype(np.float64) ** 2).mean(axis=1))
            out_id.extend([mid] * n)
            out_frame.extend(range(n))
            out_rms.extend(rms.tolist())
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_frame, pa.int64()),
                "rms": pa.array(out_rms, pa.float64()),
            }
        )


def synthesize_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for plumbing tests/benches."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = ("image/png", "audio/wav", "image/png", "video/mp4")[i % 4]
        payload = rng.bytes(256)
        rows["media_id"].append(i)
        rows["media_type"].append(kind)
        is_visual = kind != "audio/wav"
        rows["meta_width"].append(64 if is_visual else 0)
        rows["meta_height"].append(64 if is_visual else 0)
        rows["meta_sample_rate"].append(16000 if kind == "audio/wav" else 0)
        rows["payload"].append(payload)
        rows["n_bytes"].append(len(payload))
    return pa.table(
        {n_: pa.array(rows[n_], MEDIA_SCHEMA.field(n_).type) for n_ in MEDIA_SCHEMA.names}
    )


def image_features(media: rd.Dataset, out_size: int = 32, fake: bool = True) -> rd.Dataset:
    imgs = media.map_batches(
        lambda t: t.filter(pa.compute.equal(t["media_type"], "image/png")),
        batch_format="pyarrow",
    )
    return imgs.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"out_size": out_size, "fake": fake},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=default_actor_concurrency(),
    )


def audio_frames(media: rd.Dataset, fake: bool = True) -> rd.Dataset:
    auds = media.map_batches(
        lambda t: t.filter(pa.compute.equal(t["media_type"], "audio/wav")),
        batch_format="pyarrow",
    )
    return auds.map_batches(
        AudioFrameSampler,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=default_actor_concurrency(),
    )


def _decode_video(payload: bytes, n_frames: int, width: int, height: int, fake: bool) -> np.ndarray:
    """→ (n_frames, H, W, 3) uint8. STUB: real codec unavailable here."""
    if not fake:
        raise NotImplementedError("video codec not available in this container; use fake=True")
    rng = np.random.default_rng(_fake_seed(payload))
    return rng.integers(0, 256, size=(n_frames, height, width, 3), dtype=np.uint8)


class VideoFrameSampler:
    """Actor-pool stage: decode → uniform frame sample → per-frame channel
    means. Output: one row per (media_id, frame_idx) with mean_r/g/b.

    Frame sampling is uniform over the decoded clip (``sample_every``);
    batch size stays small (MEDIA_BATCH_SIZE) — video rows are the widest
    payloads in the corpus.
    """

    def __init__(self, clip_frames: int = 32, sample_every: int = 8, fake: bool = True):
        self.clip_frames = clip_frames
        self.sample_every = sample_every
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_frame, means = [], [], []
        for mid, p, w, h in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["meta_width"].to_pylist(),
            batch["meta_height"].to_pylist(),
        ):
            clip = _decode_video(p, self.clip_frames, max(w, 8), max(h, 8), self.fake)
            idxs = range(0, len(clip), self.sample_every)
            for fi in idxs:
                out_id.append(mid)
                out_frame.append(fi)
                means.append(clip[fi].reshape(-1, 3).mean(axis=0))
        m = np.asarray(means) if means else np.zeros((0, 3))
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_frame, pa.int64()),
                "mean_r": pa.array(m[:, 0], pa.float64()),
                "mean_g": pa.array(m[:, 1], pa.float64()),
                "mean_b": pa.array(m[:, 2], pa.float64()),
            }
        )


def video_frames(media: rd.Dataset, fake: bool = True) -> rd.Dataset:
    vids = media.map_batches(
        lambda t: t.filter(pa.compute.equal(t["media_type"], "video/mp4")),
        batch_format="pyarrow",
    )
    return vids.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=default_actor_concurrency(),
    )
