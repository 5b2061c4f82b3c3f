"""Multimodal (image/audio/video) column plumbing — real Ray-side, real
codecs where the environment allows, stubs elsewhere.

Media travels as opaque ``binary`` columns with typed metadata
(media_type, width/height or sample_rate, n_bytes). The decode /
feature-extract stages are actor-pool ``map_batches`` classes whose Ray
plumbing (schema, batch sizing, actor signature, output layout) is real
and tested.

Codec coverage (``fake=False``):
* audio — REAL for WAV/PCM via the stdlib ``wave`` module (8/16/32-bit,
  multichannel mixed to mono float32);
* image — REAL for PPM (P6), uncompressed 24-bit BMP (pure numpy), and
  PNG (8-bit gray/RGB/palette/RGBA, all five scanline filters — stdlib
  zlib + numpy, round 4) with a filter-0 PNG encoder twin; JPEG falls
  through to PIL when importable, else a clearly-marked
  ``NotImplementedError`` (no image library in this container);
* video — stubbed (``NotImplementedError``); no container codec.
``fake=True`` keeps the deterministic byte-hash-seeded arrays for CI.

Batch-size guidance: media rows are wide — keep ``batch_size`` small
(``MEDIA_BATCH_SIZE``) so batch × concurrency fits worker heaps, and rely
on the object store to spill blocks.
"""

from __future__ import annotations

import hashlib
import io
import struct

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


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → (H, W, 3) uint8, pure numpy."""
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raster;
    # '#' comments may appear between tokens
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace before the raster
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    return np.frombuffer(payload, np.uint8, w * h * 3, offset=pos).reshape(h, w, 3)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (H, W, 3) uint8 RGB, pure numpy."""
    import struct as st

    data_off = st.unpack_from("<I", payload, 10)[0]
    w = st.unpack_from("<i", payload, 18)[0]
    h = st.unpack_from("<i", payload, 22)[0]
    bpp = st.unpack_from("<H", payload, 28)[0]
    comp = st.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP is supported")
    bottom_up = h > 0
    h = abs(h)
    row = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    buf = np.frombuffer(payload, np.uint8, row * h, offset=data_off).reshape(h, row)
    img = buf[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img[::-1] if bottom_up else img


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (spec §9): raw is h rows of
    (1 filter byte + stride bytes). Filters None/Up are fully vectorized;
    Sub/Average/Paeth recurse along the row (Sub via a mod-256 strided
    cumsum; Average/Paeth via a per-pixel walk — PNG defines them
    sequentially, so a vector form doesn't exist)."""
    out = np.zeros((h, stride), np.uint8)
    rows = raw.reshape(h, stride + 1)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        if f == 0:  # None
            rec = line
        elif f == 1:  # Sub: prefix sums per channel offset
            rec = (
                np.cumsum(line.reshape(-1, bpp), axis=0, dtype=np.int64) & 0xFF
            ).reshape(-1)
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def _decode_png(payload: bytes) -> np.ndarray:
    """PNG → (H, W, 3) uint8, pure stdlib-zlib + numpy (round-3/4 the only
    image libs in this container are none — PPM/BMP/PNG are now all real).

    Supports the common web profile: 8-bit depth, color types 0 (gray),
    2 (RGB), 3 (palette), 6 (RGBA — alpha dropped), non-interlaced.
    """
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, plte = 8, [], None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + crc
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or interlace != 0:
        raise NotImplementedError("only 8-bit non-interlaced PNG supported")
    channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(ctype)
    if channels is None:
        raise NotImplementedError(f"PNG color type {ctype} not supported")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px[:, :, 0]]
    if ctype == 6:
        return np.ascontiguousarray(px[:, :, :3])
    return px


def encode_png(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → PNG bytes (filter 0, one IDAT) — the pure-stdlib
    sink twin of ``_decode_png`` (round-trip tested)."""
    import zlib

    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * 3)], axis=1
    ).tobytes()

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _decode_image(payload: bytes, width: int, height: int, fake: bool) -> np.ndarray:
    """→ (H, W, 3) uint8.

    Real paths: PPM (P6), uncompressed 24-bit BMP, and PNG (8-bit
    gray/RGB/palette/RGBA, stdlib zlib + numpy) — no image library
    needed; other formats (JPEG) try PIL when importable. ``fake=True``
    keeps the deterministic byte-hash-seeded array (CI path)."""
    if fake:
        rng = np.random.default_rng(_fake_seed(payload))
        return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    try:
        from PIL import Image  # absent in this container; real deployments
    except ImportError:
        raise NotImplementedError(
            "no image library available: PPM(P6)/BMP/PNG decode without PIL"
        )
    img = Image.open(io.BytesIO(payload)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def _decode_audio(payload: bytes, sample_rate: int, fake: bool) -> np.ndarray:
    """→ (n_samples,) float32 mono in [-1, 1].

    Real path: WAV/PCM via the stdlib ``wave`` module (8/16/32-bit,
    multichannel mixed to mono). ``fake=True`` keeps the deterministic
    seeded-noise array (CI path)."""
    if fake:
        rng = np.random.default_rng(_fake_seed(payload))
        return rng.standard_normal(sample_rate, dtype=np.float32)
    if payload[:4] != b"RIFF":
        raise NotImplementedError("only WAV/PCM decodable without an audio library")
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        ch = f.getnchannels()
        sw = f.getsampwidth()
        raw = f.readframes(f.getnframes())
    if sw == 1:  # 8-bit WAV is unsigned
        arr = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 2:
        arr = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        arr = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {sw}")
    if ch > 1:
        arr = arr.reshape(-1, ch).mean(axis=1)
    return arr.astype(np.float32)


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6) bytes — test/roundtrip helper."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, np.uint8).tobytes()


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """float mono in [-1, 1] → 16-bit PCM WAV bytes — test/roundtrip helper."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(
            (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
        )
    return buf.getvalue()


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
            # the decoded image's OWN shape wins (real codecs read it from
            # the payload; the meta columns are advisory)
            h, w = img.shape[:2]
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
        lambda t: t.filter(pa.compute.starts_with(t["media_type"], "image/")),
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
        lambda t: t.filter(pa.compute.starts_with(t["media_type"], "audio/")),
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
