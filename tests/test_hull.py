"""Distributed convex hull vs engine-independent property oracles."""

import numpy as np
import pyarrow as pa
import pytest


def _points_ds(x, y, group=None, blocks=4):
    import ray.data as rd

    cols = {"lon": pa.array(x, pa.float64()), "lat": pa.array(y, pa.float64())}
    if group is not None:
        cols["g"] = pa.array(group)
    return rd.from_arrow(pa.table(cols)).repartition(blocks)


def _rows(ds):
    return [(r.get("g"), r["ordinal"], r["lon"], r["lat"]) for r in ds.take_all()]


def _assert_valid_hull(pts_x, pts_y, hull):
    """Engine-independent hull properties (no reference implementation):
    vertices ⊆ input, strict convexity/CCW, every input point inside."""
    hx = np.array([h[2] for h in sorted(hull, key=lambda r: r[1])])
    hy = np.array([h[3] for h in sorted(hull, key=lambda r: r[1])])
    pset = set(zip(pts_x.tolist(), pts_y.tolist()))
    for xx, yy in zip(hx, hy):
        assert (xx, yy) in pset
    h = len(hx)
    if h >= 3:
        for i in range(h):
            ox, oy = hx[i], hy[i]
            ax, ay = hx[(i + 1) % h], hy[(i + 1) % h]
            bx, by = hx[(i + 2) % h], hy[(i + 2) % h]
            cross = (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)
            assert cross > 0  # strict CCW turns — no collinear vertices
        # every point on or inside each edge's left half-plane
        for i in range(h):
            ex, ey = hx[i], hy[i]
            dx, dy = hx[(i + 1) % h] - ex, hy[(i + 1) % h] - ey
            side = dx * (pts_y - ey) - dy * (pts_x - ex)
            assert (side >= -1e-9).all()
    # canonical start: lexicographically smallest (lon, lat)
    if h:
        start = np.lexsort((hy, hx))[0]
        assert start == 0


class TestConvexHullAgg:
    def test_random_properties_and_block_invariance(self, ray_session):
        from osmptparser_ray.spatial.hull import convex_hull_agg

        rng = np.random.default_rng(42)
        x = rng.normal(size=500)
        y = rng.normal(size=500)
        hull1 = _rows(convex_hull_agg(_points_ds(x, y, blocks=1)))
        hull8 = _rows(convex_hull_agg(_points_ds(x, y, blocks=8)))
        assert hull1 == hull8  # block structure cannot change the hull
        _assert_valid_hull(x, y, hull1)

    def test_planted_integer_square(self, ray_session):
        from osmptparser_ray.spatial.hull import convex_hull_agg

        # 4 corners + edge-interior (collinear, must drop) + interior
        x = np.array([0, 4, 4, 0, 2, 4, 2, 1, 3, 2], dtype=np.float64)
        y = np.array([0, 0, 4, 4, 0, 2, 4, 1, 3, 2], dtype=np.float64)
        hull = _rows(convex_hull_agg(_points_ds(x, y, blocks=3)))
        got = [(r[2], r[3]) for r in sorted(hull, key=lambda r: r[1])]
        assert got == [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]

    def test_degenerate_collinear_and_tiny(self, ray_session):
        from osmptparser_ray.spatial.hull import convex_hull_agg

        # all collinear -> the two endpoints
        x = np.array([0.0, 1.0, 2.0, 3.0])
        y = np.array([0.0, 1.0, 2.0, 3.0])
        hull = _rows(convex_hull_agg(_points_ds(x, y, blocks=2)))
        got = sorted((r[2], r[3]) for r in hull)
        assert got == [(0.0, 0.0), (3.0, 3.0)]
        # single point
        hull1 = _rows(convex_hull_agg(_points_ds(np.array([5.0]), np.array([7.0]), blocks=1)))
        assert [(r[2], r[3]) for r in hull1] == [(5.0, 7.0)]

    def test_grouped(self, ray_session):
        from osmptparser_ray.spatial.hull import convex_hull_agg

        rng = np.random.default_rng(7)
        groups, xs, ys = [], [], []
        for g in range(5):
            n = 60 + g
            xs.append(rng.normal(loc=g * 10, size=n))
            ys.append(rng.normal(size=n))
            groups.extend([g] * n)
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        garr = np.array(groups, dtype=np.int64)
        out = convex_hull_agg(
            _points_ds(x, y, group=garr, blocks=6), group_col="g"
        )
        rows = _rows(out)
        for g in range(5):
            sub = [r for r in rows if r[0] == g]
            _assert_valid_hull(x[garr == g], y[garr == g], sub)

    def test_duplicate_points(self, ray_session):
        from osmptparser_ray.spatial.hull import convex_hull_agg

        x = np.array([0.0, 0.0, 1.0, 1.0, 1.0, 0.5])
        y = np.array([0.0, 0.0, 0.0, 1.0, 1.0, 0.5])
        hull = _rows(convex_hull_agg(_points_ds(x, y, blocks=2)))
        got = [(r[2], r[3]) for r in sorted(hull, key=lambda r: r[1])]
        assert got == [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0)]
