"""Hot-bucket skew protection (round-3, VERDICT r2 #5): the salted /
block-decomposed plans must produce IDENTICAL results to the unsalted
plans — salting redistributes work, never changes the pair set — and must
engage on degenerate corpora that would otherwise concentrate O(n²) work
in one join partition / map_groups task.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from osmptparser_ray.embed.ann import cosine_near_dup
from osmptparser_ray.text.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_near_pairs,
    simhash_signatures,
)


def _pairs(ds, cols=("doc_a", "doc_b")):
    df = ds.to_pandas()
    return sorted(map(tuple, df[list(cols)].itertuples(index=False)))


def _skewed_docs(n_hot=60, n_cold=40):
    """A corpus with one degenerate near-identical cluster (all docs share
    the same text → same signatures → ONE hot bucket in every band) plus
    distinct cold docs."""
    ids, texts = [], []
    for i in range(n_hot):
        ids.append(i)
        texts.append("the quick brown fox jumps over the lazy dog " * 3)
    letters = "abcdefghijklmnopqrstuvwxyz"
    for j in range(n_cold):
        ids.append(1000 + j)
        texts.append(letters[j % 26] * 30 + str(j))
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    )


class TestLshSalting:
    def test_salted_equals_unsalted_on_skewed_corpus(self):
        docs = _skewed_docs()
        sigs = minhash_signatures(docs, num_perm=32, shingle_k=5).materialize()
        base = _pairs(lsh_candidate_pairs(sigs, bands=8, hot_bucket_cap=None))
        # cap=10 forces the 60-doc degenerate bucket through the salt path
        salted = _pairs(
            lsh_candidate_pairs(sigs, bands=8, hot_bucket_cap=10, hot_salt=4)
        )
        assert salted == base
        assert len(base) > 0  # the degenerate cluster produced pairs

    def test_cold_corpus_unaffected(self):
        docs = _skewed_docs(n_hot=0, n_cold=30)
        sigs = minhash_signatures(docs, num_perm=32, shingle_k=5).materialize()
        base = _pairs(lsh_candidate_pairs(sigs, bands=8, hot_bucket_cap=None))
        capped = _pairs(lsh_candidate_pairs(sigs, bands=8, hot_bucket_cap=5))
        assert capped == base


class TestHotDetectionPlans:
    def test_detectors_flag_degenerate_bucket(self, ray_session):
        """Both detection plans — key-exact groupby and slot sketch — must
        flag the degenerate 60-doc bucket (the sketch may over-flag via
        slot collisions, never under-flag)."""
        import ray

        from osmptparser_ray.text.dedup import _hot_keys_exact, _hot_slots_sketch

        docs = _skewed_docs()
        sigs = minhash_signatures(docs, num_perm=32, shingle_k=5).materialize()
        import pyarrow as pa
        import numpy as np

        def explode(batch):
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            sig = np.stack([np.asarray(s, np.uint64) for s in batch["sig"].to_pylist()])
            r = sig.shape[1] // 8
            out_band, out_hash, out_id = [], [], []
            for bi in range(8):
                chunk = sig[:, bi * r : (bi + 1) * r]
                h = np.zeros(len(ids), np.uint64)
                for j in range(chunk.shape[1]):
                    h = h * np.uint64(1099511628211) + chunk[:, j]
                out_band.extend([bi] * len(ids))
                out_hash.extend(h.tolist())
                out_id.extend(ids.tolist())
            return pa.table(
                {
                    "band": pa.array(out_band, pa.int32()),
                    "band_hash": pa.array(np.asarray(out_hash, np.uint64), pa.uint64()),
                    "doc_id": pa.array(out_id, pa.int64()),
                }
            )

        rows = sigs.map_batches(explode, batch_format="pyarrow").materialize()
        exact = _hot_keys_exact(rows, "band", "band_hash", cap=10)
        sketch = _hot_slots_sketch(rows, "band", "band_hash", cap=10)
        kind_e, hot_e = ray.get(exact)
        kind_s, hot_s = ray.get(sketch)
        assert kind_e == "keys" and len(hot_e) >= 8  # one hot key per band
        assert kind_s == "slots" and len(hot_s) >= 1


class TestSimhashSalting:
    def test_salted_equals_unsalted(self):
        docs = _skewed_docs()
        sigs = simhash_signatures(docs).materialize()
        base = _pairs(
            simhash_near_pairs(sigs, max_hamming=3, hot_bucket_cap=None),
            cols=("doc_a", "doc_b", "hamming"),
        )
        salted = _pairs(
            simhash_near_pairs(sigs, max_hamming=3, hot_bucket_cap=10, hot_salt=4),
            cols=("doc_a", "doc_b", "hamming"),
        )
        assert salted == base
        assert len(base) > 0


class TestCosineBlockDecomposition:
    def _vectors(self, n_hot=80, n_cold=14, dim=16):
        # n_cold < dim-1 so every cold vector gets a DISTINCT axis
        # (orthogonal → no cold-cold pairs)
        """Degenerate: n_hot near-identical vectors (tiny perturbations of
        one direction — all land in ONE LSH bucket and all pass 0.99) plus
        orthogonal cold vectors."""
        rng = np.random.default_rng(7)
        ids, vecs = [], []
        base = np.zeros(dim)
        base[0] = 1.0
        for i in range(n_hot):
            v = base + rng.normal(0, 1e-4, dim)
            ids.append(i)
            vecs.append(v.tolist())
        for j in range(n_cold):
            v = np.zeros(dim)
            v[1 + j % (dim - 1)] = 1.0 + j
            ids.append(1000 + j)
            vecs.append(v.tolist())
        return rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(vecs, pa.list_(pa.float64())),
                }
            )
        )

    def test_capped_equals_uncapped_on_degenerate_bucket(self):
        vecs = self._vectors()
        base = _pairs(
            cosine_near_dup(vecs, threshold=0.99, bits=4, bucket_cap=None)
        )
        capped = _pairs(
            cosine_near_dup(vecs, threshold=0.99, bits=4, bucket_cap=10, cap_blocks=4)
        )
        assert capped == base
        # the degenerate cluster is all-pairs: 80*79/2
        assert len(base) == 80 * 79 // 2

    def test_scores_preserved(self):
        vecs = self._vectors(n_hot=20, n_cold=5)
        a = (
            cosine_near_dup(vecs, threshold=0.99, bits=4, bucket_cap=None)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        b = (
            cosine_near_dup(vecs, threshold=0.99, bits=4, bucket_cap=5, cap_blocks=3)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        assert (a["doc_a"] == b["doc_a"]).all() and (a["doc_b"] == b["doc_b"]).all()
        assert np.allclose(a["score"], b["score"])
