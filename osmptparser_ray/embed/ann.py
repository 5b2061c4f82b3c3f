"""Similarity search over embedding columns (list<float>).

* ``knn_bruteforce`` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put``), every batch computes a numpy matmul against it and
  emits per-batch partial top-k rows, which a tiny groupby-per-query
  reduction merges — the scan streams, nothing materializes.
* ``lsh_ann`` — random-hyperplane LSH bucketing (fixed seed): vectors are
  hashed to signature buckets; queries probe their own bucket; exact
  cosine refine within bucket. The scale path (candidate set shrinks by
  ~2^bits); recall < 1 by design, measured against brute force in tests.
* ``cosine_near_dup`` — embedding near-duplicate pairs above a cosine
  threshold within LSH buckets.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd



def _rank_topk(partials: rd.Dataset, k: int) -> rd.Dataset:
    """Global per-query merge of partial top-k rows via the sort-scan
    ``topk_per_group`` (round-5, VERDICT r4 #3): ZERO per-query Python —
    the old ``groupby(query_id).map_groups`` paid one pandas UDF dispatch
    per query id (measured 150× worse than sort-scan at 100k groups,
    NOTES_ROUND4 #1), which at 10^8 queries IS the pipeline. Tie order
    (score desc, vec_id asc) matches the retired pandas merge exactly."""
    from ..stages.relational import topk_per_group

    ranked = topk_per_group(
        partials, "query_id", "score", k, tiebreak_col="vec_id", descending=True
    )
    return ranked.select_columns(["query_id", "rank", "vec_id", "score"])


def _to_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix (zero-ish copy)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_bruteforce(
    vectors: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Exact cosine top-k of every query against the vector dataset.

    Output: (query_id:int64, rank:int64, vec_id:int64, score:float64).
    """
    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    q_ref = ray.put((q, qids))

    class PartialTopK:
        def __init__(self):
            from ..util import cached_get

            self.q, self.qids = cached_get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_to_matrix(batch[vec_col]))
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            if m.size == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64()),
                    }
                )
            scores = self.q @ m.T  # (Q, B)
            kk = min(k, scores.shape[1])
            idx = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            rows = np.arange(scores.shape[0])[:, None]
            return pa.table(
                {
                    "query_id": pa.array(np.repeat(self.qids, kk), pa.int64()),
                    "vec_id": pa.array(ids[idx].ravel(), pa.int64()),
                    "score": pa.array(scores[rows, idx].ravel(), pa.float64()),
                }
            )

    partials = vectors.map_batches(
        lambda t, _cls=PartialTopK: _cls()(t), batch_format="pyarrow"
    )
    return _rank_topk(partials, k)


def _hyperplanes(dim: int, bits: int) -> np.ndarray:
    rng = np.random.default_rng(7)
    return rng.standard_normal((bits, dim))


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=8)
def _hyperplanes_cached(dim: int, bits: int) -> np.ndarray:
    """Per-process memo of the (deterministic, fixed-seed) plane matrix —
    every worker derives the identical planes locally, so no broadcast and
    no per-batch rebuild."""
    return _hyperplanes(dim, bits)


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0  # (n, bits)
    out = np.zeros(len(m), dtype=np.uint64)
    for i in range(planes.shape[0]):
        out |= bits[:, i].astype(np.uint64) << np.uint64(i)
    return out


def lsh_ann(
    vectors: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    bits: int = 8,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Approximate cosine top-k: random-hyperplane buckets + in-bucket refine.

    Output schema matches ``knn_bruteforce``; recall is approximate (only
    same-bucket candidates are scored).
    """
    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    planes = _hyperplanes(q.shape[1], bits)
    q_ref = ray.put((q, qids, planes))

    class BucketRefine:
        """Per-batch: bucket vectors, score only same-bucket queries."""

        def __init__(self):
            from ..util import cached_get

            self.q, self.qids, self.planes = cached_get(q_ref)
            self.qbuckets = _bucket_of(self.q, self.planes)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_to_matrix(batch[vec_col]))
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            out_q, out_v, out_s = [], [], []
            if m.size:
                vbuckets = _bucket_of(m, self.planes)
                for qi in range(len(self.q)):
                    mask = vbuckets == self.qbuckets[qi]
                    if not mask.any():
                        continue
                    scores = m[mask] @ self.q[qi]
                    cand_ids = ids[mask]
                    kk = min(k, len(scores))
                    top = np.argpartition(-scores, kk - 1)[:kk]
                    out_q.extend([self.qids[qi]] * kk)
                    out_v.extend(cand_ids[top].tolist())
                    out_s.extend(scores[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    partials = vectors.map_batches(
        lambda t, _cls=BucketRefine: _cls()(t), batch_format="pyarrow"
    )
    return _rank_topk(partials, k)


def cosine_near_dup(
    vectors: rd.Dataset,
    threshold: float = 0.95,
    bits: Optional[int] = None,
    *,
    target_bucket: int = 256,
    bucket_cap: Optional[int] = 4096,
    cap_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Embedding near-duplicate pairs (cosine ≥ threshold) via LSH buckets.

    Output: (doc_a, doc_b, score) with doc_a < doc_b. Same-bucket pairs
    only (approximate recall, exact precision).

    ``bits=None`` (default) auto-scales the bucket count to the corpus:
    2^bits ≈ n / target_bucket, clipped to [4, 24] — expected bucket
    population stays ~``target_bucket`` as the corpus grows, bounding the
    O(bucket²) in-bucket refine instead of letting buckets grow O(n) at a
    fixed bit width. (More bits also means lower recall for borderline
    pairs — raise ``target_bucket`` to trade compute for recall.) The
    plane matrix is a fixed-seed deterministic function of (dim, bits),
    derived once per worker process, not per batch.

    ``bucket_cap`` (round-3, VERDICT r2 #5): auto-bits keeps the EXPECTED
    bucket small, but a direction-degenerate corpus (many near-identical
    embeddings) still collapses into one bucket whose map_groups refine is
    O(m²) in a single task. Buckets whose population exceeds the cap are
    BLOCK-DECOMPOSED: rows get block β = h(id) mod ``cap_blocks`` and are
    replicated into every block-pair group (bucket, lo, hi) their block
    touches; each group refines only lo×hi cross pairs (or the lo==hi
    triangle), so every pair is still produced exactly once — identical
    output, worst-case group size 2·m/blocks. ``bucket_cap=None``
    disables the (one count-aggregation) detection pass.
    """
    import ray

    from ..util import cached_get

    if bits is None:
        n = vectors.count()
        bits = int(np.clip(np.ceil(np.log2(max(n, 1) / target_bucket)), 4, 24))

    def bucketize(batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[vec_col]))
        buckets = (
            _bucket_of(m, _hyperplanes_cached(m.shape[1], bits))
            if m.size
            else np.empty(0, np.uint64)
        )
        return pa.table(
            {
                "bucket": pa.array(buckets, pa.uint64()),
                id_col: batch[id_col],
                vec_col: batch[vec_col],
            }
        )

    bucketized = vectors.map_batches(bucketize, batch_format="pyarrow")

    hot_ref = None
    if bucket_cap is not None and cap_blocks > 1:
        from ray.data.aggregate import Sum

        bucketized = bucketized.materialize()  # count pass + explode pass

        def partial(batch: pa.Table) -> pa.Table:
            u, c = np.unique(
                batch["bucket"].to_numpy(zero_copy_only=False), return_counts=True
            )
            return pa.table(
                {
                    "bucket": pa.array(u, pa.uint64()),
                    "n_part": pa.array(c.astype(np.int64), pa.int64()),
                }
            )

        hot_ds = (
            bucketized.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("n_part", alias_name="n"))
            .map_batches(
                lambda t: t.filter(pa.compute.greater(t["n"], bucket_cap)).select(
                    ["bucket"]
                ),
                batch_format="pyarrow",
            )
        )
        parts = [
            b["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
            for b in hot_ds.iter_batches(batch_size=1 << 16, batch_format="pyarrow")
        ]
        flat = np.concatenate(parts) if parts else np.empty(0, np.uint64)
        hot_ref = ray.put(np.sort(flat)) if len(flat) else None

    def explode_blocks(batch: pa.Table) -> pa.Table:
        """Assign block ids; replicate hot-bucket rows into each block-pair
        group they participate in (cold rows: single group (0, 0))."""
        n = batch.num_rows
        if hot_ref is None:
            return batch.append_column(
                "blk", pa.array(np.zeros(n, np.int8), pa.int8())
            ).append_column(
                "lo", pa.array(np.zeros(n, np.int8), pa.int8())
            ).append_column("hi", pa.array(np.zeros(n, np.int8), pa.int8()))
        hot = cached_get(hot_ref)
        bk = batch["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        idx = np.searchsorted(hot, bk)
        idx[idx >= len(hot)] = len(hot) - 1
        is_hot = hot[idx] == bk
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        blk = np.where(
            is_hot, (ids * np.uint64(2654435761)) % np.uint64(cap_blocks), 0
        ).astype(np.int8)
        tables = []
        t_blk = batch.append_column("blk", pa.array(blk, pa.int8()))
        cold = t_blk.filter(pa.array(~is_hot))
        tables.append(
            cold.append_column(
                "lo", pa.array(np.zeros(cold.num_rows, np.int8), pa.int8())
            ).append_column("hi", pa.array(np.zeros(cold.num_rows, np.int8), pa.int8()))
        )
        hot_t = t_blk.filter(pa.array(is_hot))
        hblk = blk[is_hot]
        for other in range(cap_blocks):
            # the (min(blk,other), max(blk,other)) group covers every pair
            # this row can form with a row of block ``other``
            lo = np.minimum(hblk, other).astype(np.int8)
            hi = np.maximum(hblk, other).astype(np.int8)
            tables.append(
                hot_t.append_column("lo", pa.array(lo, pa.int8())).append_column(
                    "hi", pa.array(hi, pa.int8())
                )
            )
        return pa.concat_tables(tables)

    def refine(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy(dtype=np.int64)
        blk = g["blk"].to_numpy(dtype=np.int8)
        lo = int(g["lo"].iloc[0])
        hi = int(g["hi"].iloc[0])
        m = _normalize(_to_matrix(pa.array(g[vec_col])))
        order = np.argsort(ids)
        ids, m, blk = ids[order], m[order], blk[order]
        if lo == hi:
            # triangle within one block (covers the cold lo==hi==0 case)
            sel = blk == lo
            ids_s, m_s = ids[sel], m[sel]
            sim = m_s @ m_s.T
            ia, ib = np.triu_indices(len(ids_s), k=1)
            keep = sim[ia, ib] >= threshold
            return pd.DataFrame(
                {
                    "doc_a": ids_s[ia][keep],
                    "doc_b": ids_s[ib][keep],
                    "score": sim[ia, ib][keep],
                }
            )
        # cross pairs between the two blocks only — each unordered pair
        # appears in exactly one (lo, hi) group
        a_sel, b_sel = blk == lo, blk == hi
        ids_a, m_a = ids[a_sel], m[a_sel]
        ids_b, m_b = ids[b_sel], m[b_sel]
        sim = m_a @ m_b.T
        ia, ib = np.nonzero(sim >= threshold)
        da, db = ids_a[ia], ids_b[ib]
        swap = da > db
        return pd.DataFrame(
            {
                "doc_a": np.where(swap, db, da),
                "doc_b": np.where(swap, da, db),
                "score": sim[ia, ib],
            }
        )

    return (
        bucketized.map_batches(explode_blocks, batch_format="pyarrow")
        .groupby(["bucket", "lo", "hi"])
        .map_groups(refine, batch_format="pandas")
    )



# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse k-means quantizer + probed refine
# ---------------------------------------------------------------------------


def _kmeans_fit(sample: np.ndarray, n_lists: int, n_iter: int = 10) -> np.ndarray:
    """Deterministic mini k-means (fixed seed, spherical): → (n_lists, d)
    centroids. Runs on a driver-side SAMPLE — the classic IVF train step."""
    rng = np.random.default_rng(11)
    sample = _normalize(sample)
    idx = rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)
    cents = sample[idx].copy()
    for _ in range(n_iter):
        sims = sample @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_build(
    vectors: rd.Dataset,
    n_lists: int = 16,
    train_sample: int = 2048,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train the coarse quantizer and assign every vector to its list.

    Returns (centroids ray.ObjectRef, assigned Dataset with a ``list_id``
    column). Training samples the head of the stream (deterministic);
    assignment is one vectorized pass.
    """
    sample_rows = vectors.limit(train_sample).take_all()
    sample = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample_rows])
    cents = _kmeans_fit(sample, n_lists)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        from ..util import cached_get

        c = cached_get(cents_ref)
        m = _normalize(_to_matrix(batch[vec_col]))
        lists = (
            np.argmax(m @ c.T, axis=1).astype(np.int32)
            if m.size
            else np.empty(0, np.int32)
        )
        return batch.append_column("list_id", pa.array(lists, pa.int32()))

    return cents_ref, vectors.map_batches(assign, batch_format="pyarrow")


def ivf_ann(
    vectors: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """IVF approximate cosine top-k: probe the ``n_probe`` nearest lists per
    query, exact-refine within them. Output schema matches knn_bruteforce;
    recall grows with n_probe (n_probe == n_lists ⇒ exact)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    cents_ref, assigned = ivf_build(vectors, n_lists, id_col=id_col, vec_col=vec_col)
    cents = ray.get(cents_ref)
    nprobe = min(n_probe, len(cents))
    probes = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]  # (Q, n_probe)
    probe_ref = ray.put((q, qids, probes))

    def refine(batch: pa.Table) -> pa.Table:
        from ..util import cached_get

        q_, qids_, probes_ = cached_get(probe_ref)
        m = _normalize(_to_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lists = batch["list_id"].to_numpy(zero_copy_only=False)
        out_q, out_v, out_s = [], [], []
        if m.size:
            for qi in range(len(q_)):
                mask = np.isin(lists, probes_[qi])
                if not mask.any():
                    continue
                scores = m[mask] @ q_[qi]
                cand = ids[mask]
                kk = min(k, len(scores))
                top = np.argpartition(-scores, kk - 1)[:kk]
                out_q.extend([qids_[qi]] * kk)
                out_v.extend(cand[top].tolist())
                out_s.extend(scores[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    partials = assigned.map_batches(refine, batch_format="pyarrow")
    return _rank_topk(partials, k)


# ---------------------------------------------------------------------------
# Big-big IVF ANN join — queries are a Dataset too (broadcast-free)
# ---------------------------------------------------------------------------


def ivf_ann_join(
    vectors: rd.Dataset,
    queries: rd.Dataset,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    query_vec_col: Optional[str] = None,
    train_sample: int = 2048,
    vec_chunks: Optional[int] = None,
    target_group: int = 4096,
) -> rd.Dataset:
    """IVF ANN where BOTH sides are Datasets — the broadcast-free scale
    path for when the query set itself is too large to ``ray.put``
    (``knn_bruteforce``/``ivf_ann`` broadcast the query matrix; at 10^8+
    queries that object no longer fits a worker heap).

    Physical plan (posting-list join):

    1. train the coarse quantizer on a driver-side vector SAMPLE
       (standard IVF; the only driver materialization, ≤``train_sample``
       rows),
    2. assign every vector to its nearest list (one row) plus a chunk
       salt ``h(id) mod vec_chunks`` bounding per-group population,
    3. replicate every query onto its ``n_probe`` nearest lists × all
       chunks (repeat/take, vectorized),
    4. union both sides (side tag) and ``groupby(list, chunk)`` —
       FEW, LARGE groups (``n_lists × vec_chunks``), the regime where a
       per-group UDF is the right tool (one matmul per group; contrast
       ``topk_per_group``'s many-tiny-groups regime) — each group emits
       vectorized per-query partial top-k rows,
    5. global per-query merge via the sort-scan ``topk_per_group`` (zero
       per-query Python).

    Every (query, vector) candidate pair meets in EXACTLY one group (a
    vector lives in one (list, chunk); a query's replicas are distinct
    (list, chunk) keys), so no dedup pass is needed. ``n_probe ==
    n_lists`` ⇒ exact brute-force result, the correctness gate.

    ``vec_chunks=None`` auto-sizes ceil(n / (n_lists × target_group)) so
    expected group population stays ~``target_group`` as the corpus
    grows. Output: (query_id, rank, vec_id, score), exactly ``ivf_ann``'s
    schema — parity-tested against it (same seed ⇒ same quantizer ⇒ same
    candidates).
    """
    from ..stages.relational import topk_per_group
    from ..util import cached_get

    qid_col = query_id_col or id_col
    qvec_col = query_vec_col or vec_col

    sample_rows = vectors.limit(train_sample).take_all()
    if not sample_rows:
        # empty vector side: nothing can match (and an all-empty union
        # side breaks the groupby) — short-circuit
        return rd.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        )
    sample = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample_rows])
    cents = _kmeans_fit(sample, n_lists)
    cents_ref = ray.put(cents)
    n_l = len(cents)
    nprobe = min(n_probe, n_l)

    if vec_chunks is None:
        n_vec = vectors.count()
        vec_chunks = max(1, int(np.ceil(n_vec / (n_l * target_group))))
    n_chunks = int(vec_chunks)

    def assign_vectors(batch: pa.Table) -> pa.Table:
        c = cached_get(cents_ref)
        m = _normalize(_to_matrix(batch[vec_col]))
        lists = (
            np.argmax(m @ c.T, axis=1).astype(np.int32)
            if m.size
            else np.empty(0, np.int32)
        )
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        chunk = ((ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(n_chunks)).astype(np.int32)
        return pa.table(
            {
                "list_id": pa.array(lists, pa.int32()),
                "chunk": pa.array(chunk, pa.int32()),
                "side": pa.array(np.zeros(len(ids), np.int8), pa.int8()),
                "rid": pa.array(ids, pa.int64()),
                "vec": batch[vec_col],
            }
        )

    def assign_queries(batch: pa.Table) -> pa.Table:
        c = cached_get(cents_ref)
        m = _normalize(_to_matrix(batch[qvec_col]))
        n = len(m) if m.size else 0
        if not n:
            return pa.table(
                {
                    "list_id": pa.array([], pa.int32()),
                    "chunk": pa.array([], pa.int32()),
                    "side": pa.array([], pa.int8()),
                    "rid": pa.array([], pa.int64()),
                    "vec": pa.array([], batch[qvec_col].type),
                }
            )
        # same probe rule as ivf_ann (argsort of -sims): ties resolve
        # identically, keeping the parity contract exact
        probes = np.argsort(-(m @ c.T), axis=1)[:, :nprobe]  # (n, nprobe)
        # replicate each query row across nprobe lists × n_chunks chunks
        reps = nprobe * n_chunks
        row_idx = np.repeat(np.arange(n), reps)
        lists = np.repeat(probes.astype(np.int32).reshape(-1), n_chunks)
        chunk = np.tile(np.arange(n_chunks, dtype=np.int32), n * nprobe)
        taken = batch.select([qid_col, qvec_col]).take(pa.array(row_idx))
        ids = taken[qid_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "list_id": pa.array(lists, pa.int32()),
                "chunk": pa.array(chunk, pa.int32()),
                "side": pa.array(np.ones(len(ids), np.int8), pa.int8()),
                "rid": pa.array(ids, pa.int64()),
                "vec": taken[qvec_col],
            }
        )

    tagged = vectors.map_batches(assign_vectors, batch_format="pyarrow").union(
        queries.map_batches(assign_queries, batch_format="pyarrow")
    )

    def refine(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy(dtype=np.int8)
        rid = g["rid"].to_numpy(dtype=np.int64)
        m = _normalize(_to_matrix(pa.array(g["vec"])))
        v_sel = side == 0
        q_sel = ~v_sel
        if not v_sel.any() or not q_sel.any():
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=np.int64),
                    "vec_id": pd.Series([], dtype=np.int64),
                    "score": pd.Series([], dtype=np.float64),
                }
            )
        vid, vm = rid[v_sel], m[v_sel]
        qid, qm = rid[q_sel], m[q_sel]
        sim = qm @ vm.T  # (q_g, v_g)
        kk = min(k, sim.shape[1])
        # vectorized per-query partial top-k within the group. Keep ALL
        # candidates tied with the k-th score (>=, not argpartition
        # truncation): an arbitrary tie cut here could drop the candidate
        # the global (score desc, vec_id asc) tiebreak would keep; the
        # sort-scan merge applies the exact tiebreak to the survivors.
        if kk < sim.shape[1]:
            kth = np.partition(sim, sim.shape[1] - kk, axis=1)[
                :, sim.shape[1] - kk
            ]
            rows, cols = np.nonzero(sim >= kth[:, None])
        else:
            rows, cols = np.nonzero(np.ones_like(sim, dtype=bool))
        return pd.DataFrame(
            {
                "query_id": qid[rows],
                "vec_id": vid[cols],
                "score": sim[rows, cols],
            }
        )

    partials = tagged.groupby(["list_id", "chunk"]).map_groups(
        refine, batch_format="pandas"
    )
    ranked = topk_per_group(
        partials, "query_id", "score", k, tiebreak_col="vec_id", descending=True
    )
    return ranked.select_columns(["query_id", "rank", "vec_id", "score"])
