"""Point-in-polygon: vectorized ray-casting kernel + ring utilities.

Exact refine step for the cell-cover candidate generation
(spatial.join.pip_join). Pure numpy; the SAME kernel is used by the engine
and by the brute-force test oracle, so assignments match exactly by
construction (FIXTURES.md §5: on-edge points follow the even-odd crossing
convention below).
"""

from __future__ import annotations

import numpy as np


def points_in_ring(lats, lons, ring_lats, ring_lons) -> np.ndarray:
    """Even-odd ray-casting test of many points against one ring.

    ``ring_*`` are the polygon vertices in order (closed or open — the
    closing edge is implied). Vectorized over points × edges:
    O(P·E) numpy ops, no Python loop over points.
    """
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    ry = np.asarray(ring_lats, dtype=np.float64)
    rx = np.asarray(ring_lons, dtype=np.float64)
    if len(rx) and (rx[0] == rx[-1] and ry[0] == ry[-1]):
        rx, ry = rx[:-1], ry[:-1]
    n = len(rx)
    if n < 3:
        return np.zeros(len(lats), dtype=bool)
    x1, y1 = rx, ry
    x2, y2 = np.roll(rx, -1), np.roll(ry, -1)
    # points (P,1) vs edges (1,E)
    px = lons[:, None]
    py = lats[:, None]
    cond = (y1[None, :] > py) != (y2[None, :] > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (py - y1[None, :]) * (x2 - x1)[None, :] / (y2 - y1)[None, :]
    crossing = cond & (px < xint)
    return (crossing.sum(axis=1) % 2).astype(bool)


def ring_bbox(ring_lats, ring_lons) -> tuple[float, float, float, float]:
    """(min_lon, min_lat, max_lon, max_lat) of a ring."""
    ry = np.asarray(ring_lats, dtype=np.float64)
    rx = np.asarray(ring_lons, dtype=np.float64)
    return float(rx.min()), float(ry.min()), float(rx.max()), float(ry.max())


def convex_hull(lats, lons) -> tuple[np.ndarray, np.ndarray]:
    """Andrew's monotone chain convex hull → (hull_lats, hull_lons), CCW,
    not closed. Used to build route hulls from flattened geometries."""
    pts = np.unique(np.stack([np.asarray(lons, float), np.asarray(lats, float)], axis=1), axis=0)
    if len(pts) <= 2:
        return pts[:, 1], pts[:, 0]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = np.array(lower[:-1] + upper[:-1])
    return hull[:, 1], hull[:, 0]


def pack_ring(ring_lats, ring_lons) -> bytes:
    """Serialize a ring to bytes (shuffle-safe payload: pyarrow joins can
    carry binary but not list columns)."""
    ry = np.asarray(ring_lats, dtype=np.float64)
    rx = np.asarray(ring_lons, dtype=np.float64)
    return np.stack([ry, rx], axis=1).tobytes()


def unpack_ring(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    arr = np.frombuffer(blob, dtype=np.float64).reshape(-1, 2)
    return arr[:, 0], arr[:, 1]
