"""Edit-distance pair mining vs scalar references and DuckDB."""

import numpy as np
import pyarrow as pa
import pytest


def _lev_ref(a: str, b: str) -> int:
    """Independent scalar Levenshtein (classic two-row DP)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _ds(texts, blocks=3):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(blocks)


class TestLevenshteinBatch:
    def test_matches_scalar_reference(self):
        from osmptparser_ray.text.fuzzy import levenshtein_batch

        rng = np.random.default_rng(13)
        alpha = "abcde"
        pairs = []
        for _ in range(200):
            la, lb = rng.integers(0, 12, 2)
            a = "".join(rng.choice(list(alpha), la))
            b = "".join(rng.choice(list(alpha), lb))
            pairs.append((a, b))
        got = levenshtein_batch(
            [a.encode() for a, _ in pairs], [b.encode() for _, b in pairs]
        )
        want = [_lev_ref(a, b) for a, b in pairs]
        assert got.tolist() == want

    def test_edges(self):
        from osmptparser_ray.text.fuzzy import levenshtein_batch

        out = levenshtein_batch(
            [b"", b"abc", b"abc", b"kitten"], [b"", b"", b"abc", b"sitting"]
        )
        assert out.tolist() == [0, 3, 0, 3]


class TestEditDistancePairs:
    def test_matches_brute_force(self, ray_session):
        from osmptparser_ray.text.fuzzy import edit_distance_pairs

        texts = [
            "transformer", "transformers", "tranformer",   # 0,1,2 cluster
            "attention", "attension",                      # 3,4
            "completely different string",                 # 5
            "gradient", "gradiant", "gradients",           # 6,7,8
            "a", "b", "",                                  # 9,10,11 short
        ]
        got = sorted(
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(_ds(texts), k=2).take_all()
        )
        want = sorted(
            (i, j, _lev_ref(texts[i], texts[j]))
            for i in range(len(texts))
            for j in range(i + 1, len(texts))
            if _lev_ref(texts[i], texts[j]) <= 2
        )
        assert got == want

    def test_cross_bucket_lengths(self, ray_session):
        """Pair straddling a length-bucket boundary must still be found
        (the replication-completeness proof exercised)."""
        from osmptparser_ray.text.fuzzy import edit_distance_pairs

        # band_width=8: len 7 is bucket 0, len 9 is bucket 1; dist 2
        texts = ["abcdefg", "abcdefgxy"]
        got = [
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(_ds(texts, blocks=2), k=2,
                                         band_width=8).take_all()
        ]
        assert got == [(0, 1, 2)]

    def test_k_zero_is_exact_dup(self, ray_session):
        from osmptparser_ray.text.fuzzy import edit_distance_pairs

        texts = ["same", "same", "off"]
        got = [
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(_ds(texts), k=0).take_all()
        ]
        assert got == [(0, 1, 0)]

    def test_codepoint_level_non_ascii(self, ray_session):
        """ADVICE r4 regression: distances are CODEPOINT-level — an
        accented-char substitution costs 1 (the old bytes-level DP
        charged up to 4 and byte-length banding could miss the pair),
        and the band uses char counts (é is 2 utf-8 bytes)."""
        from osmptparser_ray.text.fuzzy import edit_distance_pairs, levenshtein_batch

        assert levenshtein_batch(["café"], ["cafe"]).tolist() == [1]
        assert levenshtein_batch(["naïve"], ["naive"]).tolist() == [1]
        assert levenshtein_batch(["日本語です"], ["日本語だよ"]).tolist() == [2]
        texts = ["café con leche", "cafe con leche", "käse küche xyz"]
        got = sorted(
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(_ds(texts), k=2).take_all()
        )
        assert got == [(0, 1, 1)]

    def test_chunked_dp_parity(self):
        """The chunked DP returns the same distances as one-shot (chunk
        boundary crossing the pair list)."""
        from osmptparser_ray.text.fuzzy import levenshtein_batch

        rng = np.random.default_rng(3)
        alpha = list("abcé日")
        pairs = [
            (
                "".join(rng.choice(alpha, rng.integers(0, 10))),
                "".join(rng.choice(alpha, rng.integers(0, 10))),
            )
            for _ in range(50)
        ]
        a = [p[0] for p in pairs]
        b = [p[1] for p in pairs]
        one = levenshtein_batch(a, b)
        many = levenshtein_batch(a, b, chunk_pairs=7)
        assert one.tolist() == many.tolist()
        assert one.tolist() == [_lev_ref(x, y) for x, y in pairs]

    def test_caps_raise(self, ray_session):
        from osmptparser_ray.text.fuzzy import edit_distance_pairs

        long = "x" * 300
        with pytest.raises(Exception, match="max_len|RayTaskError"):
            edit_distance_pairs(_ds([long, "y"]), k=1).take_all()
        many = ["abc"] * 40
        with pytest.raises(Exception, match="bucket_cap|RayTaskError"):
            edit_distance_pairs(_ds(many), k=1, bucket_cap=10).take_all()
