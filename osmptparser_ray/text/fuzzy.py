"""Fuzzy string matching — edit-distance near-duplicate pairs.

The typo-level companion to MinHash/SimHash: short strings (titles,
names, URLs) whose Jaccard shingles are too coarse need true edit
distance. ``edit_distance_pairs`` finds all pairs within Levenshtein
distance ``k`` using LENGTH-banded candidate buckets:

* a pair at distance ≤ k has length difference ≤ k, so bucketing by
  ``len // band_width`` (band_width > k) and replicating every string
  into the ≤ 2 buckets covering ``[len−k, len]`` is COMPLETE (no false
  negatives — proof in ``_bucket_rows``),
* each pair is OWNED by exactly one bucket (the shorter string's own
  bucket), so no dedup pass is needed,
* within a bucket: all-pairs vectorized DP Levenshtein — the two
  nested loops run over CHARACTER POSITIONS (≤ max_len² iterations of
  numpy ops across the whole pair batch), never over pairs.

Contract: short strings (``max_len`` default 128, loud error past it)
and bounded buckets (``bucket_cap``, loud error — raise ``band_width``
or pre-dedup exactly). For document-scale near-dup use the MinHash
pipeline; this operator is for the short-text tail it cannot see.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def levenshtein_batch(
    a_list: "list[bytes]", b_list: "list[bytes]", cap: Optional[int] = None
) -> np.ndarray:
    """Levenshtein distances for aligned pair lists, vectorized across
    pairs (loops run over character positions only). ``cap`` just lets
    callers early-exit rows later; the DP is always exact."""
    p = len(a_list)
    if p == 0:
        return np.empty(0, np.int64)
    la = max(len(a) for a in a_list)
    lb = max(len(b) for b in b_list)
    am = np.zeros((p, la), np.uint8)
    bm = np.zeros((p, lb), np.uint8)
    na = np.empty(p, np.int64)
    nb = np.empty(p, np.int64)
    for i, (a, b) in enumerate(zip(a_list, b_list)):
        am[i, : len(a)] = np.frombuffer(a, np.uint8)
        bm[i, : len(b)] = np.frombuffer(b, np.uint8)
        na[i], nb[i] = len(a), len(b)
    BIG = np.int64(1 << 20)
    # dp[j] over b positions; mask positions beyond each pair's length so
    # padded cells can never win the min
    prev = np.tile(np.arange(lb + 1, dtype=np.int64), (p, 1))
    prev[np.arange(lb + 1)[None, :] > nb[:, None]] = BIG
    for i in range(1, la + 1):
        cur = np.full((p, lb + 1), BIG, np.int64)
        alive = na >= i
        cur[alive, 0] = i
        ai = am[:, i - 1]
        for j in range(1, lb + 1):
            sub = prev[:, j - 1] + (ai != bm[:, j - 1])
            ins = cur[:, j - 1] + 1
            dele = prev[:, j] + 1
            c = np.minimum(np.minimum(sub, ins), dele)
            jalive = alive & (nb >= j)
            cur[jalive, j] = c[jalive]
        # rows already past their own length keep prev (their final row)
        keep = ~alive
        if keep.any():
            cur[keep] = prev[keep]
        prev = cur
    return prev[np.arange(p), nb]


def _bucket_rows(ids, texts, k: int, w: int):
    """Replicate each string into the buckets covering [len−k, len].

    A pair (a, b) with |len_a − len_b| ≤ k meets in bucket
    min(len_a, len_b) // w: the shorter string's OWN bucket (len // w),
    which the longer string also joined because
    (len_long − k) // w ≤ min_len // w ≤ len_long // w. That bucket is
    the pair's unique OWNER (the verify step re-checks ownership), so
    every qualifying pair is produced exactly once.
    """
    lens = np.array([len(t) for t in texts], np.int64)
    lo_b = np.maximum(lens - k, 0) // w
    hi_b = lens // w
    reps = (hi_b - lo_b + 1).astype(np.int64)
    row = np.repeat(np.arange(len(ids), dtype=np.int64), reps)
    # bucket sequence per row: lo_b[r] .. hi_b[r]
    offs = np.concatenate([[0], np.cumsum(reps)])[:-1]
    seq = np.arange(len(row), dtype=np.int64) - offs[row]
    bucket = lo_b[row] + seq
    return row, bucket


def edit_distance_pairs(
    ds: rd.Dataset,
    k: int = 2,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_width: Optional[int] = None,
    bucket_cap: int = 4096,
    max_len: int = 128,
) -> rd.Dataset:
    """All pairs within Levenshtein distance ``k`` → (id_a, id_b, dist),
    ``id_a < id_b``. See the module docstring for the plan and contract.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    w = int(band_width if band_width is not None else max(k + 1, 8))
    if w <= k:
        raise ValueError("band_width must exceed k (bucket completeness)")

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = [
            ("" if t is None else t).encode("utf-8")
            for t in batch[text_col].to_pylist()
        ]
        too_long = [i for i, t in enumerate(texts) if len(t) > max_len]
        if too_long:
            raise ValueError(
                f"edit_distance_pairs: string longer than max_len={max_len} "
                f"(id {ids[too_long[0]]}) — this operator is for SHORT "
                "strings; use the MinHash pipeline for documents"
            )
        row, bucket = _bucket_rows(ids, texts, k, w)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                id_col: pa.array(ids[row], pa.int64()),
                "blob": pa.array([texts[r] for r in row], pa.binary()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        m = len(g)
        if m > bucket_cap:
            raise ValueError(
                f"edit_distance_pairs: bucket of {m} strings exceeds "
                f"bucket_cap={bucket_cap} — raise band_width or exact-dedup "
                "first (a degenerate corpus of same-length strings lands in "
                "one bucket)"
            )
        bkt = int(g["bucket"].iloc[0])
        ids = g[id_col].to_numpy(dtype=np.int64)
        blobs = list(g["blob"])
        lens = np.array([len(b) for b in blobs], np.int64)
        ia, ib = np.triu_indices(m, k=1)
        if len(ia) == 0:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "dist": []}
            ).astype({"id_a": np.int64, "id_b": np.int64, "dist": np.int64})
        # prune: length gap, duplicate ids (a string replicated into two
        # buckets never meets itself — same id), and pair OWNERSHIP
        # (min-length bucket == this bucket)
        keep = (
            (np.abs(lens[ia] - lens[ib]) <= k)
            & (ids[ia] != ids[ib])
            & (np.minimum(lens[ia], lens[ib]) // w == bkt)
        )
        ia, ib = ia[keep], ib[keep]
        if len(ia) == 0:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "dist": []}
            ).astype({"id_a": np.int64, "id_b": np.int64, "dist": np.int64})
        dist = levenshtein_batch([blobs[i] for i in ia], [blobs[i] for i in ib])
        ok = dist <= k
        a, b = ids[ia][ok], ids[ib][ok]
        swap = a > b
        return pd.DataFrame(
            {
                "id_a": np.where(swap, b, a),
                "id_b": np.where(swap, a, b),
                "dist": dist[ok].astype(np.int64),
            }
        )

    return exploded.groupby("bucket").map_groups(verify, batch_format="pandas")
