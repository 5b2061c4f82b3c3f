"""Distributed k-means over an embedding column (Lloyd iterations).

The iterative-broadcast shape (the ``pagerank`` pattern applied to
vectors): centers are driver state broadcast per round (k·d floats —
tiny); each iteration is ONE streaming pass that assigns every vector to
its nearest center AND emits per-center partial (sum, count) moments
from the same batch (map-side combine — the shuffle carries k rows per
block, never the corpus). The driver folds partials into new centers.

Determinism contract: init is the vectors of the ``k`` smallest ids
(one extra pass), ties in assignment break to the LOWEST center index
(numpy argmin), and the driver folds block partials in block order —
the result is a pure function of the input, never of scheduling.

No counterpart in the reference (clustering is out of its scope) — this
is the training-data extension for embedding-space corpus curation
(dedup-cluster pruning, diversity sampling, IVF coarse quantizers: the
``ivf_ann`` quantizer in ``embed/ann.py`` samples instead; this is the
exact iterative refinement).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..util import cached_get
from .ann import _to_matrix


def _init_centers(
    vectors: rd.Dataset, k: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Deterministic init: the vectors of the k SMALLEST ids.

    One streaming pass of per-block partial top-k (smallest) — only
    k rows per block reach the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return batch
        keep = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(np.sort(keep)))

    rows = pa.concat_tables(
        [
            b
            for b in vectors.select_columns([id_col, vec_col])
            .map_batches(partial, batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow")
        ],
        promote_options="default",
    )
    ids = rows[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")[:k]
    m = _to_matrix(rows[vec_col].combine_chunks())
    if len(order) < k:
        raise ValueError(f"kmeans: k={k} exceeds the {len(order)} input vectors")
    return m[order].copy()


def kmeans(
    vectors: rd.Dataset,
    k: int,
    n_iter: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Lloyd's k-means, fixed ``n_iter`` rounds, squared-L2 metric.

    Output: (``id_col``, cluster:int64) — the FINAL assignment of every
    vector. Empty clusters keep their previous center (the standard
    fixed-point convention; deterministic).
    """
    if k <= 0 or n_iter < 1:
        raise ValueError("kmeans: k and n_iter must be positive")
    centers = _init_centers(vectors, k, id_col, vec_col)

    for _ in range(n_iter):
        c_ref = ray.put(centers)

        def partial_moments(batch: pa.Table) -> pa.Table:
            c = cached_get(c_ref)
            dim = c.shape[1]
            m = _to_matrix(batch[vec_col])
            if m.size == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                        "vsum": pa.FixedSizeListArray.from_arrays(
                            pa.array([], pa.float64()), dim
                        ),
                    }
                )
            # argmin ||x−c||² == argmax (x·c − ||c||²/2); ties → lowest
            # center index (np.argmax takes the first maximum)
            d = m @ c.T - 0.5 * (c * c).sum(axis=1)[None, :]
            assign = np.argmax(d, axis=1)
            cnt = np.bincount(assign, minlength=len(c)).astype(np.int64)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            live = np.flatnonzero(cnt)
            return pa.table(
                {
                    "cluster": pa.array(live, pa.int64()),
                    "cnt": pa.array(cnt[live], pa.int64()),
                    "vsum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums[live].ravel(), pa.float64()), dim
                    ),
                }
            )

        sums = np.zeros_like(centers)
        cnts = np.zeros(k, np.int64)
        for b in vectors.map_batches(
            partial_moments, batch_format="pyarrow"
        ).iter_batches(batch_size=None, batch_format="pyarrow"):
            cl = b["cluster"].to_numpy(zero_copy_only=False)
            cn = b["cnt"].to_numpy(zero_copy_only=False)
            vs = _to_matrix(b["vsum"].combine_chunks())
            np.add.at(cnts, cl, cn)
            np.add.at(sums, cl, vs)
        live = cnts > 0
        centers = centers.copy()
        centers[live] = sums[live] / cnts[live, None]

    final_ref = ray.put(centers)

    def assign_final(batch: pa.Table) -> pa.Table:
        c = cached_get(final_ref)
        m = _to_matrix(batch[vec_col])
        if m.size == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                }
            )
        d = m @ c.T - 0.5 * (c * c).sum(axis=1)[None, :]
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(np.argmax(d, axis=1).astype(np.int64), pa.int64()),
            }
        )

    return vectors.map_batches(assign_final, batch_format="pyarrow")
