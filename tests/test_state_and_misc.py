"""Checkpoint/resume, multimodal plumbing, and driver-contract smoke."""

import os

import pyarrow as pa
import pytest


class TestCheckpoint:
    def test_write_resume_skip(self, ray_session, tmp_path, sf_dir):
        import ray.data as rd

        from osmptparser_ray.state.checkpoint import (
            completed_partitions,
            run_partitioned,
        )

        out = str(tmp_path / "out")
        calls = []

        def make(p):
            calls.append(p)
            return rd.read_parquet(f"{sf_dir}/region.parquet")

        recs = run_partitioned(["a", "b"], make, out)
        assert len(recs) == 2 and calls == ["a", "b"]
        assert set(completed_partitions(out)) == {"a", "b"}
        assert all(r.rows == 5 for r in recs)
        assert os.path.isdir(os.path.join(out, "part=a"))

        # resume: make() must NOT be called again
        calls.clear()
        recs2 = run_partitioned(["a", "b"], make, out)
        assert calls == [] and len(recs2) == 2

        # new partition: only it is computed
        run_partitioned(["a", "b", "c"], make, out)
        assert calls == ["c"]

    def test_crashed_tmp_is_replaced(self, ray_session, tmp_path, sf_dir):
        import ray.data as rd

        from osmptparser_ray.state.checkpoint import completed_partitions, write_partition

        out = str(tmp_path / "out2")
        os.makedirs(os.path.join(out, "part=x"))  # stale dir, no manifest line
        ds = rd.read_parquet(f"{sf_dir}/region.parquet")
        rec = write_partition(ds, out, "x")
        assert rec.rows == 5
        assert "x" in completed_partitions(out)
        files = os.listdir(os.path.join(out, "part=x"))
        assert any(f.endswith(".parquet") for f in files)


class TestMultimodal:
    def test_image_features_plumbing(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.multimodal import image_features, synthesize_media_table

        media = rd.from_arrow(synthesize_media_table(32))
        rows = image_features(media, out_size=8, fake=True).take_all()
        assert len(rows) == 16  # half the media rows are images
        for r in rows:
            assert 0.0 <= r["feat_mean_r"] <= 255.0
            assert r["out_w"] == 8

    def test_audio_frames_plumbing(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.multimodal import audio_frames, synthesize_media_table

        media = rd.from_arrow(synthesize_media_table(32))
        rows = audio_frames(media, fake=True).take_all()
        assert len(rows) == 8 * 8  # 8 audio rows × 8 frames
        assert all(r["rms"] > 0 for r in rows)

    def test_video_frames_plumbing(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.multimodal import synthesize_media_table, video_frames

        media = rd.from_arrow(synthesize_media_table(32))
        rows = video_frames(media, fake=True).take_all()
        # 8 video rows × 4 sampled frames (32 clip frames / sample_every 8)
        assert len(rows) == 8 * 4
        assert all(0.0 <= r["mean_r"] <= 255.0 for r in rows)

    def test_video_real_codec_raises(self):
        from osmptparser_ray.multimodal import _decode_video

        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            _decode_video(b"x", 4, 8, 8, fake=False)

    def test_real_codec_raises(self):
        from osmptparser_ray.multimodal import _decode_image

        with pytest.raises(NotImplementedError):
            _decode_image(b"x", 4, 4, fake=False)

    def test_fake_decode_deterministic(self):
        from osmptparser_ray.multimodal import _decode_image

        a = _decode_image(b"payload", 8, 8, fake=True)
        b = _decode_image(b"payload", 8, 8, fake=True)
        assert (a == b).all()


class TestDriverContract:
    def test_entry_smoke(self, ray_session):
        import __ray_entry__ as m

        df = m.entry()
        assert len(df) >= 1
        assert list(df.columns) == ["component", "rows"]
        assert (df["rows"] >= 0).all()
        by = dict(zip(df["component"], df["rows"]))
        assert by["public_transports"] == 4  # 2 replicas × 2 relations

    def test_queries_have_oracles_or_doc(self, ray_session):
        import __ray_entry__ as m

        qs = m.queries()
        oracles = m.oracle_sql()
        assert set(oracles) <= set(qs)
        assert len(qs) >= 20

    @pytest.mark.parametrize("name", ["ptv2_fixture", "cell_assign", "token_count"])
    def test_sample_queries_run(self, ray_session, sf_dir, name):
        import __ray_entry__ as m

        res = m.queries()[name](sf_dir)
        import ray.data as rd

        n = res.count() if isinstance(res, rd.Dataset) else len(res)
        assert n > 0


class TestResumableIngest:
    def test_ingest_resume_skips_done(self, ray_session, tmp_path):
        from osmptparser_ray.sources import synthesize_pages_parquet
        from osmptparser_ray.pipelines.ingest import resumable_ingest, page_shards
        from osmptparser_ray.state.checkpoint import completed_partitions

        pages = str(tmp_path / "pages")
        synthesize_pages_parquet(pages, replicas=2, files=4)
        out = str(tmp_path / "elements")
        recs = resumable_ingest(pages, out, shards_per_partition=2)
        assert len(recs) == 2  # 4 shards / 2 per partition
        assert sum(r.rows for r in recs) == 1382  # 2 replicas x 691 elements
        done = completed_partitions(out)
        assert len(done) == 2
        # rerun: lineage preserved, nothing recomputed (same records back)
        recs2 = resumable_ingest(pages, out, shards_per_partition=2)
        assert {r.partition for r in recs2} == {r.partition for r in recs}
        assert all(r.input_ref for r in recs2)

        # the ingested elements are readable and complete
        import ray.data as rd

        ds = rd.read_parquet(out)
        assert ds.count() == 1382

    def test_flagship_to_parquet(self, ray_session, tmp_path):
        from osmptparser_ray.sources import synthesize_pages_parquet
        from osmptparser_ray.pipelines.ingest import flagship_to_parquet

        pages = str(tmp_path / "pages_f")
        synthesize_pages_parquet(pages, replicas=1, files=2)
        out = str(tmp_path / "flagship")
        recs = flagship_to_parquet(pages, out)
        by = {r.partition: r.rows for r in recs}
        assert by["public_transports"] == 2
        assert by["stops"] == 32
        assert set(by) == {"public_transports", "stops", "pip", "knn", "tiles"}


class TestRealCodecs:
    """Real decode paths: WAV via stdlib wave, PPM/BMP via pure numpy."""

    def test_wav_roundtrip_exact(self):
        import numpy as np

        from osmptparser_ray.multimodal import _decode_audio, encode_wav_pcm16

        t = np.arange(16000, dtype=np.float64) / 16000.0
        sig = 0.5 * np.sin(2 * np.pi * 440.0 * t)
        payload = encode_wav_pcm16(sig, 16000)
        got = _decode_audio(payload, 16000, fake=False)
        assert got.dtype == np.float32 and len(got) == 16000
        # 16-bit quantization (1 LSB truncation + 32767/32768 scale skew)
        assert np.abs(got - sig).max() < 1e-4

    def test_ppm_roundtrip_exact(self):
        import numpy as np

        from osmptparser_ray.multimodal import _decode_image, encode_ppm

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
        got = _decode_image(encode_ppm(img), 0, 0, fake=False)
        assert np.array_equal(got, img)

    def test_bmp_decode(self):
        import struct

        import numpy as np

        from osmptparser_ray.multimodal import _decode_image

        # hand-build a 3x2 bottom-up 24-bit BMP
        w, h = 3, 2
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        row = (w * 3 + 3) & ~3
        raster = np.zeros((h, row), np.uint8)
        for y in range(h):
            raster[y, : w * 3] = img[h - 1 - y, :, ::-1].reshape(-1)  # bottom-up BGR
        data = raster.tobytes()
        header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        header += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
        got = _decode_image(header + data, 0, 0, fake=False)
        assert np.array_equal(got, img)

    def test_image_features_real_ppm_pipeline(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from osmptparser_ray.multimodal import MEDIA_SCHEMA, encode_ppm, image_features

        # constant-color images -> feature means are exactly the colors
        colors = [(10, 20, 30), (200, 100, 50)]
        rows = {k: [] for k in MEDIA_SCHEMA.names}
        for i, c in enumerate(colors):
            img = np.full((64, 64, 3), c, np.uint8)
            p = encode_ppm(img)
            rows["media_id"].append(i)
            rows["media_type"].append("image/ppm")
            rows["payload"].append(p)
            rows["meta_width"].append(64)
            rows["meta_height"].append(64)
            rows["meta_sample_rate"].append(0)
            rows["n_bytes"].append(len(p))
        media = rd.from_arrow(
            pa.table({n: pa.array(rows[n], MEDIA_SCHEMA.field(n).type) for n in MEDIA_SCHEMA.names})
        )
        got = sorted(image_features(media, fake=False).take_all(), key=lambda r: r["media_id"])
        for r, c in zip(got, colors):
            assert (r["feat_mean_r"], r["feat_mean_g"], r["feat_mean_b"]) == c

    def test_audio_frames_real_wav_pipeline(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from osmptparser_ray.multimodal import MEDIA_SCHEMA, encode_wav_pcm16, audio_frames

        # constant-amplitude square wave -> per-frame RMS == amplitude
        amp = 0.25
        sig = np.where(np.arange(8192) % 2 == 0, amp, -amp)
        p = encode_wav_pcm16(sig, 16000)
        rows = {
            "media_id": [7], "media_type": ["audio/wav"], "payload": [p],
            "meta_width": [0], "meta_height": [0], "meta_sample_rate": [16000],
            "n_bytes": [len(p)],
        }
        media = rd.from_arrow(
            pa.table({n: pa.array(rows[n], MEDIA_SCHEMA.field(n).type) for n in MEDIA_SCHEMA.names})
        )
        got = audio_frames(media, fake=False).take_all()
        assert len(got) == 8  # 8192 samples / 1024 frame_len
        for r in got:
            assert abs(r["rms"] - amp) < 1e-3


class TestPngCodec:
    """Pure stdlib-zlib + numpy PNG decode (round 4): all five scanline
    filters and all four supported color types, against an independent
    scalar unfilter reference."""

    @staticmethod
    def _build_png(w, h, ctype, rows_filtered, plte=None):
        import struct
        import zlib

        from osmptparser_ray.multimodal import _PNG_SIG

        def chunk(t, d):
            return (
                struct.pack(">I", len(d))
                + t
                + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        out = _PNG_SIG + chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        )
        if plte is not None:
            out += chunk(b"PLTE", plte.tobytes())
        raw = b"".join(rows_filtered)
        return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

    @staticmethod
    def _ref_unfilter(rows, bpp, stride):
        import numpy as np

        prev = [0] * stride
        out = []
        for f, line in rows:
            rec = list(line)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 0:
                    add = 0
                elif f == 1:
                    add = a
                elif f == 2:
                    add = b
                elif f == 3:
                    add = (a + b) // 2
                else:
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    add = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                rec[x] = (rec[x] + add) & 0xFF
            out.append(rec)
            prev = rec
        return np.array(out, np.uint8)

    def test_roundtrip_filter0(self):
        import numpy as np

        from osmptparser_ray.multimodal import _decode_image, encode_png

        img = np.random.default_rng(0).integers(0, 256, (23, 17, 3), np.uint8)
        assert np.array_equal(_decode_image(encode_png(img), 0, 0, fake=False), img)

    def test_all_filters_rgb(self):
        import numpy as np

        from osmptparser_ray.multimodal import _decode_png

        rng = np.random.default_rng(1)
        w, h, stride = 7, 5, 21
        rows = [
            (f, rng.integers(0, 256, stride).astype(np.uint8).tolist())
            for f in (0, 1, 2, 3, 4)
        ]
        png = self._build_png(w, h, 2, [bytes([f]) + bytes(l) for f, l in rows])
        expect = self._ref_unfilter(rows, 3, stride).reshape(h, w, 3)
        assert np.array_equal(_decode_png(png), expect)

    def test_gray_palette_rgba(self):
        import numpy as np

        from osmptparser_ray.multimodal import _decode_png

        rng = np.random.default_rng(2)
        w, h = 6, 4
        g_rows = [
            (4, rng.integers(0, 256, w).astype(np.uint8).tolist()) for _ in range(h)
        ]
        png_g = self._build_png(w, h, 0, [bytes([f]) + bytes(l) for f, l in g_rows])
        eg = self._ref_unfilter(g_rows, 1, w).reshape(h, w, 1)
        assert np.array_equal(_decode_png(png_g), np.repeat(eg, 3, axis=2))

        plte = rng.integers(0, 256, (256, 3)).astype(np.uint8)
        p_rows = [
            (1, rng.integers(0, 256, w).astype(np.uint8).tolist()) for _ in range(h)
        ]
        png_p = self._build_png(
            w, h, 3, [bytes([f]) + bytes(l) for f, l in p_rows], plte=plte
        )
        ep = self._ref_unfilter(p_rows, 1, w).reshape(h, w)
        assert np.array_equal(_decode_png(png_p), plte[ep])

        a_rows = [
            (2, rng.integers(0, 256, w * 4).astype(np.uint8).tolist())
            for _ in range(h)
        ]
        png_a = self._build_png(w, h, 6, [bytes([f]) + bytes(l) for f, l in a_rows])
        ea = self._ref_unfilter(a_rows, 4, w * 4).reshape(h, w, 4)
        assert np.array_equal(_decode_png(png_a), ea[:, :, :3])

    def test_unsupported_raises(self):
        import numpy as np
        import pytest as pt

        from osmptparser_ray.multimodal import _decode_png, encode_png

        with pt.raises(ValueError):
            _decode_png(b"nope")
        # 16-bit depth rejected
        img = np.zeros((2, 2, 3), np.uint8)
        payload = bytearray(encode_png(img))
        payload[8 + 8 + 8] = 16  # IHDR bit-depth byte
        with pt.raises((NotImplementedError, Exception)):
            _decode_png(bytes(payload))


class TestDecayedSum:
    """Exact dyadic time-decay: batch operator + incremental fold parity."""

    def _events(self, rng, n=4000, users=37, hours=80):
        import numpy as np

        h = 3600_000_000
        ts = rng.integers(0, hours * h, n, dtype=np.int64)
        return pa.table(
            {
                "user_id": pa.array(
                    rng.integers(0, users, n, dtype=np.int64), pa.int64()
                ),
                "ts": pa.array(ts, pa.int64()),
                "v": pa.array(
                    rng.integers(-500, 5000, n, dtype=np.int64), pa.int64()
                ),
            }
        )

    def _batch_ref(self, tbl, now_ep, max_k=20, scale_bits=20):
        import numpy as np

        h = 3600_000_000
        ep = tbl["ts"].to_numpy() // h
        k = np.clip(now_ep - ep, 0, max_k)
        c = tbl["v"].to_numpy() * (np.int64(1) << (scale_bits - k))
        out = {}
        for u, x in zip(tbl["user_id"].to_numpy(), c):
            out[int(u)] = out.get(int(u), 0) + int(x)
        return out

    def test_batch_matches_scalar_reference(self, ray_session):
        import numpy as np
        import ray.data as rd

        from osmptparser_ray.stages.relational import decayed_sum

        rng = np.random.default_rng(5)
        tbl = self._events(rng)
        now_ep = int(tbl["ts"].to_numpy().max() // 3600_000_000)
        got = {
            int(r["user_id"]): int(r["decayed"])
            for r in decayed_sum(
                rd.from_arrow(tbl).repartition(9),
                "user_id", "ts", "v",
                half_life_us=3600_000_000, now_ep=now_ep,
            ).take_all()
        }
        assert got == self._batch_ref(tbl, now_ep)

    def test_incremental_fold_parity_and_state_bound(
        self, ray_session, tmp_path
    ):
        """Three chunks folded in a shuffled order == batch; per-key state
        stays <= max_k+1 rows; refolding a run_id is a no-op; constants
        are locked across folds."""
        import numpy as np
        import pytest
        import ray.data as rd

        from osmptparser_ray.stages.relational import decayed_sum
        from osmptparser_ray.state.incremental import (
            decayed_sum_append,
            decayed_sum_state_read,
            pq_read_table,
            _decay_pointer,
        )

        h = 3600_000_000
        rng = np.random.default_rng(11)
        tbl = self._events(rng, n=6000, hours=200)  # >> max_k epochs
        now_ep = int(tbl["ts"].to_numpy().max() // h)
        order = tbl["ts"].to_numpy().argsort()
        tbl = tbl.take(pa.array(order))
        thirds = [tbl.slice(0, 2000), tbl.slice(2000, 2000), tbl.slice(4000)]
        state = str(tmp_path / "decay")
        for rid, part in (("b", thirds[1]), ("a", thirds[0]), ("c", thirds[2])):
            decayed_sum_append(
                rd.from_arrow(part).repartition(5), state,
                "user_id", "ts", "v", half_life_us=h, run_id=rid,
            )
        # idempotent refold
        n_again = decayed_sum_append(
            rd.from_arrow(thirds[0]), state, "user_id", "ts", "v",
            half_life_us=h, run_id="a",
        )
        assert n_again == now_ep
        inc = {
            int(r["user_id"]): int(r["decayed"])
            for r in decayed_sum_state_read(state).take_all()
        }
        batch = {
            int(r["user_id"]): int(r["decayed"])
            for r in decayed_sum(
                rd.from_arrow(tbl), "user_id", "ts", "v",
                half_life_us=h, now_ep=now_ep,
            ).take_all()
        }
        assert inc == batch
        ptr = _decay_pointer(state)
        st = pq_read_table(os.path.join(state, ptr["path"]))
        per_key = {}
        for u in st["user_id"].to_numpy():
            per_key[int(u)] = per_key.get(int(u), 0) + 1
        assert max(per_key.values()) <= 21  # max_k + 1 buckets
        with pytest.raises(ValueError, match="half_life_us"):
            decayed_sum_append(
                rd.from_arrow(thirds[0]), state, "user_id", "ts", "v",
                half_life_us=h * 2, run_id="z",
            )
        with pytest.raises(ValueError, match="max_k"):
            decayed_sum_append(
                rd.from_arrow(thirds[0]), state, "user_id", "ts", "v",
                half_life_us=h, max_k=5, run_id="z",
            )
