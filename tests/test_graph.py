"""PageRank vs a scalar numpy reference + the exact-cycle invariant."""

import numpy as np
import pyarrow as pa
import pytest


def _edges_ds(src, dst, blocks=3):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(np.asarray(src, np.int64), pa.int64()),
                "dst": pa.array(np.asarray(dst, np.int64), pa.int64()),
            }
        )
    ).repartition(blocks)


def _reference_pagerank(src, dst, n_iter, d):
    """Independent scalar implementation (dict-based, no shared code)."""
    nodes = sorted(set(src) | set(dst))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s in src:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = r[out == 0].sum()
        inflow = np.zeros(n)
        for s, t in zip(src, dst):
            inflow[idx[t]] += r[idx[s]] / out[idx[s]]
        r = (1.0 - d) / n + d * (inflow + dangling / n)
    return {v: r[idx[v]] for v in nodes}


class TestPagerank:
    def test_matches_reference_random_graph(self, ray_session):
        from osmptparser_ray.graph import pagerank

        rng = np.random.default_rng(9)
        src = rng.integers(0, 30, 150)
        dst = rng.integers(0, 30, 150)
        got = {
            r["node"]: r["rank"]
            for r in pagerank(_edges_ds(src, dst), n_iter=8, damping=0.85).take_all()
        }
        want = _reference_pagerank(src.tolist(), dst.tolist(), 8, 0.85)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12)

    def test_plan_parity_broadcast_vs_shuffle(self, ray_session):
        from osmptparser_ray.graph import pagerank

        rng = np.random.default_rng(21)
        src_ = rng.integers(0, 40, 200)
        dst_ = rng.integers(0, 40, 200)
        ed = _edges_ds(src_, dst_)
        a = {r["node"]: r["rank"]
             for r in pagerank(ed, n_iter=5, damping=0.85, plan="broadcast").take_all()}
        b = {r["node"]: r["rank"]
             for r in pagerank(ed, n_iter=5, damping=0.85, plan="shuffle").take_all()}
        assert set(a) == set(b)
        for v in a:
            assert a[v] == pytest.approx(b[v], abs=1e-12)

    def test_string_node_ids_auto_plan(self, ray_session):
        """ADVICE r4: plan='auto' used to crash on non-integer node ids
        (broadcast hard-casts to int64) — it must fall back to the
        shuffle plan; an explicit broadcast request raises clearly."""
        import pyarrow as pa
        import ray.data as rd

        from osmptparser_ray.graph import pagerank

        ed = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(["a", "b", "c", "a"]),
                    "dst": pa.array(["b", "c", "a", "c"]),
                }
            )
        )
        got = {r["node"]: r["rank"] for r in pagerank(ed, n_iter=4).take_all()}
        assert set(got) == {"a", "b", "c"}
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
        with pytest.raises(ValueError, match="integer node ids"):
            pagerank(ed, n_iter=2, plan="broadcast")

    def test_cycle_uniform_exact_both_plans(self, ray_session):
        from osmptparser_ray.graph import pagerank

        src_ = list(range(8))
        dst_ = [(i + 1) % 8 for i in range(8)]
        for plan in ("broadcast", "shuffle"):
            out = pagerank(_edges_ds(src_, dst_), n_iter=4, damping=0.5,
                           plan=plan).take_all()
            assert all(r["rank"] == 1.0 / 8 for r in out), plan

    def test_cycle_uniform_exact(self, ray_session):
        from osmptparser_ray.graph import pagerank

        # two disjoint cycles (8 + 4 nodes): uniform 1/12 is an EXACT
        # float64 fixed point at damping 0.5 (halving commutes with
        # IEEE rounding) — bit equality, not approx
        src = list(range(8)) + list(range(100, 104))
        dst = [(i + 1) % 8 for i in range(8)] + [100 + (i + 1) % 4 for i in range(4)]
        out = pagerank(_edges_ds(src, dst), n_iter=5, damping=0.5).take_all()
        assert len(out) == 12
        for r in out:
            assert r["rank"] == 1.0 / 12

    def test_dangling_mass_conserved(self, ray_session):
        from osmptparser_ray.graph import pagerank

        # star with a sink hub: ranks must still sum to ~1
        src = [1, 2, 3, 4]
        dst = [0, 0, 0, 0]
        out = pagerank(_edges_ds(src, dst), n_iter=12, damping=0.85).take_all()
        total = sum(r["rank"] for r in out)
        assert total == pytest.approx(1.0, abs=1e-9)
        ranks = {r["node"]: r["rank"] for r in out}
        assert ranks[0] > ranks[1]  # hub dominates
        want = _reference_pagerank(src, dst, 12, 0.85)
        for v in want:
            assert ranks[v] == pytest.approx(want[v], abs=1e-12)
