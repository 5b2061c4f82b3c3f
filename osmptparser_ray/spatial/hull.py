"""Distributed convex hull over a points Dataset (ST_ConvexHull analogue).

The hull of a union is determined by the hulls of the parts, so the
operator is a classic two-level reduction that never materializes the
point set:

1. per-batch PARTIAL hull — a vectorized Akl–Toussaint prune (points
   strictly inside the octagon of the 8 directional extremes can never
   be hull vertices) drops ~all of a random batch, then Andrew's
   monotone chain (``spatial/pip.py``) runs on the tiny residue; only
   the partial hull's vertices travel,
2. final merge — the surviving candidates (O(hull × #blocks) rows, not
   O(n)) are chained once per group.

Adversarial inputs (every point ON a circle) defeat the prune; then the
partial chain still bounds work at O(batch log batch) per task and the
merge carries every point — same caveat as any hull algorithm.

Output: one row per hull vertex — (group?, ordinal, lon, lat) — in CCW
order starting from the lexicographically smallest (lon, lat) vertex,
COLLINEAR edge-interior points dropped (strict turns only), so the
vertex list is a canonical function of the point SET: deterministic
across block structure, parallelism, and row order.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .pip import convex_hull as _chain


def _prune_candidates(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Akl–Toussaint: boolean mask of points that MAY be hull vertices.

    Builds the convex octagon of the extremes in the 8 directions
    (±x, ±y, ±(x+y), ±(x−y)) and keeps only points NOT strictly inside
    it. Fully vectorized; keeps everything when n ≤ 8.
    """
    n = len(x)
    if n <= 8:
        return np.ones(n, bool)
    dirs = np.stack([x, y, x + y, x - y])
    ext = np.concatenate([np.argmax(dirs, axis=1), np.argmin(dirs, axis=1)])
    hlat, hlon = _chain(y[ext], x[ext])  # chain(lats, lons) -> (lats, lons)
    hlat, hlon = np.asarray(hlat, np.float64), np.asarray(hlon, np.float64)
    if len(hlat) < 3:
        return np.ones(n, bool)
    # CCW polygon (chain output): strictly inside ⇔ left of every edge
    ex, ey = hlon, hlat
    nx_, ny_ = np.roll(ex, -1), np.roll(ey, -1)
    # cross((v1-v0), (p-v0)) > 0 for all edges ⇒ strictly inside ⇒ prune
    cross = (nx_ - ex)[:, None] * (y[None, :] - ey[:, None]) - (
        ny_ - ey
    )[:, None] * (x[None, :] - ex[:, None])
    inside = (cross > 0).all(axis=0)
    return ~inside


def _hull_rows(
    x: np.ndarray, y: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Canonical hull of a point set → (ordinal, lon, lat) arrays."""
    hlat, hlon = _chain(y, x)
    hlat, hlon = np.asarray(hlat, np.float64), np.asarray(hlon, np.float64)
    if len(hlat) == 0:
        return np.empty(0, np.int64), hlon, hlat
    # _chain starts the CCW cycle at the sorted-first point already
    # (lower chain begins at min (lon, lat)); make that explicit so the
    # contract survives any future chain change
    start = np.lexsort((hlat, hlon))[0]
    hlon = np.roll(hlon, -start)
    hlat = np.roll(hlat, -start)
    return np.arange(len(hlat), dtype=np.int64), hlon, hlat


def convex_hull_agg(
    points: rd.Dataset,
    lat_col: str = "lat",
    lon_col: str = "lon",
    group_col: Optional[str] = None,
) -> rd.Dataset:
    """Convex hull vertices of a points Dataset (optionally per group).

    Global hull (``group_col=None``): output (ordinal, lon, lat).
    Grouped: (group_col, ordinal, lon, lat), one hull per group value.

    The partial pass shrinks every (batch, group) to its own hull
    vertices, so the final ``groupby`` moves O(hull) rows per
    (group, block) — the merge never sees raw points. Works at any
    group cardinality: partials are computed inside ``map_batches``
    with a vectorized per-batch group split (lexsort + reduceat
    boundaries), not one task per group.
    """

    def partial(batch: pa.Table) -> pa.Table:
        y = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if group_col is None:
            keep = _prune_candidates(x, y)
            xs, ys = x[keep], y[keep]
            _, hlon, hlat = _hull_rows(xs, ys)
            return pa.table(
                {
                    "lon": pa.array(hlon, pa.float64()),
                    "lat": pa.array(hlat, pa.float64()),
                }
            )
        g = batch[group_col].to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        g, x, y = g[order], x[order], y[order]
        bounds = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        out_g, out_x, out_y = [], [], []
        for i, s in enumerate(bounds):
            e = bounds[i + 1] if i + 1 < len(bounds) else len(g)
            xs, ys = x[s:e], y[s:e]
            keep = _prune_candidates(xs, ys)
            _, hlon, hlat = _hull_rows(xs[keep], ys[keep])
            out_g.append(np.full(len(hlon), g[s]))
            out_x.append(hlon)
            out_y.append(hlat)
        gv = np.concatenate(out_g) if out_g else np.empty(0, g.dtype)
        return pa.table(
            {
                group_col: pa.array(gv),
                "lon": pa.array(
                    np.concatenate(out_x) if out_x else np.empty(0), pa.float64()
                ),
                "lat": pa.array(
                    np.concatenate(out_y) if out_y else np.empty(0), pa.float64()
                ),
            }
        )

    partials = points.map_batches(partial, batch_format="pyarrow")

    if group_col is None:
        key = "__hull_k"
        partials = partials.map_batches(
            lambda t: t.append_column(key, pa.array(np.zeros(t.num_rows, np.int8))),
            batch_format="pyarrow",
        )
    else:
        key = group_col

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        x = g["lon"].to_numpy(dtype=np.float64)
        y = g["lat"].to_numpy(dtype=np.float64)
        ordinal, hlon, hlat = _hull_rows(x, y)
        out = {"ordinal": ordinal, "lon": hlon, "lat": hlat}
        if group_col is not None:
            out = {group_col: np.full(len(ordinal), g[group_col].iloc[0]), **out}
        return pd.DataFrame(out)

    merged = partials.groupby(key).map_groups(merge, batch_format="pandas")
    cols = ([group_col] if group_col else []) + ["ordinal", "lon", "lat"]
    return merged.select_columns(cols)
