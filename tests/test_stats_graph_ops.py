"""Round-5 operators: corr_by_group (exact integer moments), skyline
(distributed Pareto frontier), triangle_count (degree-orientation wedge
counting, broadcast + shuffle twins), group_concat_sorted (sort-scan
ordered string agg)."""

import numpy as np
import pyarrow as pa
import pytest


def _brute_skyline(pts: np.ndarray) -> np.ndarray:
    dom = np.zeros(len(pts), bool)
    for i in range(len(pts)):
        le = (pts <= pts[i]).all(axis=1)
        lt = (pts < pts[i]).any(axis=1)
        dom[i] = (le & lt).any()
    return np.unique(pts[~dom], axis=0)


def _brute_triangles(a: np.ndarray, b: np.ndarray) -> int:
    E = set((min(u, v), max(u, v)) for u, v in zip(a.tolist(), b.tolist()) if u != v)
    adj: dict = {}
    for u, v in E:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return sum(1 for u, v in E for w in (adj[u] & adj[v]) if w > v)


class TestCorrByGroup:
    def test_matches_exact_expression(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.stages.stats import corr_by_group

        rng = np.random.RandomState(0)
        g = rng.randint(0, 5, 3000).astype(np.int64)
        x = rng.randint(0, 100, 3000).astype(np.int64)
        y = x * 2 + rng.randint(0, 50, 3000)
        ds = rd.from_arrow(pa.table({"g": g, "x": x, "y": y})).repartition(7)
        out = (
            corr_by_group(ds, "g", "x", "y")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        for i, gg in enumerate(sorted(set(g.tolist()))):
            m = g == gg
            n = int(m.sum())
            sx, sy = int(x[m].sum()), int(y[m].sum())
            sxx = int((x[m] * x[m]).sum())
            syy = int((y[m] * y[m]).sum())
            sxy = int((x[m] * y[m]).sum())
            corr = float(n * sxy - sx * sy) / (
                np.sqrt(float(n * sxx - sx * sx)) * np.sqrt(float(n * syy - sy * sy))
            )
            assert out.loc[i, "n"] == n
            # BITWISE equality — the whole point of integer moments
            assert out.loc[i, "corr"] == corr
            assert out.loc[i, "var_x"] == float(n * sxx - sx * sx) / float(n * n)

    def test_zero_variance_group_is_null(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.stages.stats import corr_by_group

        ds = rd.from_arrow(
            pa.table(
                {
                    "g": pa.array([1, 1, 1], pa.int64()),
                    "x": pa.array([5, 5, 5], pa.int64()),
                    "y": pa.array([1, 2, 3], pa.int64()),
                }
            )
        )
        out = corr_by_group(ds, "g", "x", "y").to_pandas()
        assert out["corr"].isna().all()
        assert (out["var_x"] == 0.0).all()

    def test_non_integral_float_is_loud(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.stages.stats import corr_by_group

        ds = rd.from_arrow(
            pa.table(
                {
                    "g": pa.array([1, 1], pa.int64()),
                    "x": pa.array([1.5, 2.0], pa.float64()),
                    "y": pa.array([1, 2], pa.int64()),
                }
            )
        )
        with pytest.raises(Exception, match="non-integral"):
            corr_by_group(ds, "g", "x", "y").to_pandas()


class TestSkyline:
    def test_2d_matches_brute_force(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.stages.stats import skyline

        rng = np.random.RandomState(7)
        pts = rng.rand(20000, 2)
        ds = rd.from_arrow(pa.table({"a": pts[:, 0], "b": pts[:, 1]})).repartition(9)
        sky = (
            skyline(ds, ["a", "b"])
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        ref = _brute_skyline(pts)
        assert len(sky) == len(ref)
        assert np.array_equal(sky.values, ref)

    def test_3d_matches_brute_force(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.stages.stats import skyline

        rng = np.random.RandomState(8)
        pts = rng.rand(3000, 3)
        ds = rd.from_arrow(
            pa.table({"a": pts[:, 0], "b": pts[:, 1], "c": pts[:, 2]})
        ).repartition(5)
        sky = (
            skyline(ds, ["a", "b", "c"])
            .to_pandas()
            .sort_values(["a", "b", "c"])
            .reset_index(drop=True)
        )
        ref = _brute_skyline(pts)
        assert len(sky) == len(ref)
        assert np.array_equal(sky.values, ref)

    def test_duplicates_and_ties(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.stages.stats import skyline

        # duplicate frontier point + tie on one axis
        pts = np.array([[0.0, 1.0], [0.0, 1.0], [1.0, 0.0], [0.0, 2.0], [1.0, 1.0]])
        ds = rd.from_arrow(pa.table({"a": pts[:, 0], "b": pts[:, 1]})).repartition(2)
        sky = skyline(ds, ["a", "b"]).to_pandas().sort_values(["a", "b"]).values
        assert np.array_equal(sky, np.array([[0.0, 1.0], [1.0, 0.0]]))

    def test_survivor_cap_is_loud(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.stages.stats import skyline

        # anti-correlated: every point is Pareto-optimal
        x = np.arange(100, dtype=np.float64)
        ds = rd.from_arrow(pa.table({"a": x, "b": -x}))
        with pytest.raises(ValueError, match="survivor_cap"):
            skyline(ds, ["a", "b"], survivor_cap=10).to_pandas()


class TestTriangleCount:
    def test_plans_match_brute_force(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.graph import triangle_count

        rng = np.random.RandomState(1)
        a = rng.randint(0, 200, 5000).astype(np.int64)
        b = rng.randint(0, 200, 5000).astype(np.int64)
        edges = rd.from_arrow(pa.table({"src": a, "dst": b})).repartition(6)
        ref = _brute_triangles(a, b)
        for plan in ("broadcast", "shuffle"):
            out = triangle_count(edges, plan=plan).to_pandas()
            assert int(out["triangles"][0]) == ref, plan

    def test_empty_and_single_triangle(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.graph import triangle_count

        e0 = rd.from_arrow(
            pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        )
        assert int(triangle_count(e0).to_pandas()["triangles"][0]) == 0
        e1 = rd.from_arrow(
            pa.table(
                {"src": pa.array([1, 2, 3], pa.int64()), "dst": pa.array([2, 3, 1], pa.int64())}
            )
        )
        for plan in ("broadcast", "shuffle"):
            assert int(triangle_count(e1, plan=plan).to_pandas()["triangles"][0]) == 1

    def test_duplicate_and_self_edges_ignored(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.graph import triangle_count

        # triangle plus self-loop, parallel and reversed duplicates
        src = pa.array([1, 2, 3, 1, 2, 1, 3], pa.int64())
        dst = pa.array([2, 3, 1, 1, 1, 2, 2], pa.int64())
        e = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)
        assert int(triangle_count(e, plan="broadcast").to_pandas()["triangles"][0]) == 1

    def test_node_cap_is_loud(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.graph import triangle_count

        e = rd.from_arrow(
            pa.table(
                {"src": pa.array([1, 2, 3], pa.int64()), "dst": pa.array([2, 3, 1], pa.int64())}
            )
        )
        with pytest.raises(ValueError, match="node_cap"):
            triangle_count(e, plan="broadcast", node_cap=2).to_pandas()


class TestGroupConcatSorted:
    def test_matches_pandas_reference(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from osmptparser_ray.stages.relational import group_concat_sorted

        rng = np.random.RandomState(3)
        n = 20000
        key = rng.randint(0, 300, n).astype(np.int64)
        ordc = np.arange(n, dtype=np.int64)
        rng.shuffle(ordc)
        val = pa.array([f"v{i % 17}" for i in range(n)], pa.string())
        ds = rd.from_arrow(pa.table({"k": key, "o": ordc, "val": val})).repartition(11)
        mine = (
            group_concat_sorted(ds, "k", ["o"], "val", sep="|")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        df = pd.DataFrame({"k": key, "o": ordc, "val": val.to_pylist()})
        ref = (
            df.sort_values(["k", "o"])
            .groupby("k")["val"]
            .agg("|".join)
            .reset_index(name="concat")
        )
        assert mine["k"].tolist() == ref["k"].tolist()
        assert mine["concat"].tolist() == ref["concat"].tolist()

    def test_group_spanning_every_block(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.stages.relational import group_concat_sorted

        t = pa.table(
            {
                "k": pa.array([7] * 1000, pa.int64()),
                "o": pa.array(range(1000), pa.int64()),
                "val": pa.array([str(i) for i in range(1000)], pa.string()),
            }
        )
        out = group_concat_sorted(rd.from_arrow(t).repartition(9), "k", ["o"], "val").to_pandas()
        assert len(out) == 1
        assert out["concat"][0] == ",".join(str(i) for i in range(1000))

    def test_null_values_are_loud(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.stages.relational import group_concat_sorted

        t = pa.table(
            {
                "k": pa.array([1, 1], pa.int64()),
                "o": pa.array([1, 2], pa.int64()),
                "val": pa.array(["a", None], pa.string()),
            }
        )
        with pytest.raises(Exception, match="NULL"):
            group_concat_sorted(rd.from_arrow(t), "k", ["o"], "val").to_pandas()

    def test_string_keys_and_empty(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.stages.relational import group_concat_sorted

        t = pa.table(
            {
                "k": pa.array(["a", "b", "a"]),
                "o": pa.array([2, 1, 1], pa.int64()),
                "val": pa.array(["x", "y", "z"]),
            }
        )
        out = (
            group_concat_sorted(rd.from_arrow(t).repartition(2), "k", ["o"], "val")
            .to_pandas()
            .sort_values("k")
        )
        assert out["concat"].tolist() == ["z,x", "y"]
        e = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "o": pa.array([], pa.int64()),
                    "val": pa.array([], pa.string()),
                }
            )
        )
        assert len(group_concat_sorted(e, "k", ["o"], "val").to_pandas()) == 0


class TestKMeans:
    @staticmethod
    def _ref_lloyd(ids, X, k, n_iter):
        order = np.argsort(ids)[:k]
        C = X[order].copy()
        for _ in range(n_iter):
            d = X @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
            a = np.argmax(d, axis=1)
            for j in range(k):
                m = a == j
                if m.any():
                    C[j] = X[m].mean(axis=0)
        d = X @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
        return np.argmax(d, axis=1)

    def test_planted_clusters_exact(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.embed.kmeans import kmeans

        ids = np.arange(4000, dtype=np.int64)
        cl = ids % 8
        centers = np.arange(8)[:, None] * 100.0 + np.arange(4)[None, :]
        X = centers[cl] + ((ids[:, None] * (np.arange(4) + 3)[None, :]) % 7 - 3)
        t = pa.table(
            {
                "vec_id": ids,
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(X.ravel().astype(np.float64), pa.float64()), 4
                ),
            }
        )
        out = (
            kmeans(rd.from_arrow(t).repartition(7), 8, n_iter=3)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert (out["cluster"].values == cl).all()

    def test_matches_single_node_lloyd(self, ray_session):
        import ray.data as rd

        from osmptparser_ray.embed.kmeans import kmeans

        rng = np.random.RandomState(5)
        n, dim, k = 3000, 6, 7
        X = rng.randn(n, dim) * 2
        ids = np.arange(n, dtype=np.int64)
        t = pa.table(
            {
                "vec_id": ids,
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(X.ravel(), pa.float64()), dim
                ),
            }
        )
        out = (
            kmeans(rd.from_arrow(t).repartition(9), k, n_iter=4)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        ref = self._ref_lloyd(ids, X, k, 4)
        # same init + same tie rule; assignment parity on well-conditioned
        # random data (block-order float sums stay within tie margins)
        assert (out["cluster"].values == ref).all()

    def test_k_exceeds_rows_is_loud(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from osmptparser_ray.embed.kmeans import kmeans

        t = pa.table(
            {
                "vec_id": pa.array([1, 2], pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array([0.0, 1.0, 2.0, 3.0], pa.float64()), 2
                ),
            }
        )
        with _pytest.raises(ValueError, match="exceeds"):
            kmeans(rd.from_arrow(t), 5, n_iter=1).to_pandas()
