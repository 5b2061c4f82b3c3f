"""Incremental sessionize: chunk-folding parity with the batch operator."""

import os

import numpy as np
import pyarrow as pa
import pytest


def _events(us, users, ids):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(
                    np.asarray(us, np.int64), pa.timestamp("us")
                ),
                "event_id": pa.array(ids, pa.int64()),
            }
        )
    ).repartition(3)


def _sessions(ds):
    return sorted(
        (r["user_id"], r["session_id"], r["n_events"], r["start_us"], r["end_us"])
        for r in ds.take_all()
    )


@pytest.fixture()
def corpus():
    """200 events / 12 users, gaps straddling the 60-s session threshold."""
    rng = np.random.default_rng(3)
    users = rng.integers(0, 12, size=200)
    # per-user increasing timestamps with mixed gaps
    order = np.argsort(users, kind="stable")
    us = np.zeros(200, np.int64)
    t = {}
    for i in order:
        u = int(users[i])
        step = int(rng.choice([5, 20, 90, 200])) * 1_000_000
        t[u] = t.get(u, 1_000_000_000) + step
        us[i] = t[u]
    ids = np.arange(200, dtype=np.int64)
    return us, users, ids


class TestSessionizeAppend:
    def test_chunk_parity_with_batch(self, ray_session, corpus, tmp_path):
        from osmptparser_ray.state.incremental import sessionize_append
        from osmptparser_ray.streams import sessionize

        us, users, ids = corpus
        state = str(tmp_path / "st")
        # split by GLOBAL time into 3 chunks (per-user monotone append)
        cuts = np.quantile(us, [0.4, 0.75])
        masks = [us <= cuts[0], (us > cuts[0]) & (us <= cuts[1]), us > cuts[1]]
        view = None
        for i, m in enumerate(masks):
            view = sessionize_append(
                _events(us[m], users[m], ids[m]), state, 60.0, run_id=str(i)
            )
        full = sessionize(_events(us, users, ids), 60.0)
        assert _sessions(view) == _sessions(full)

    def test_idempotent_rerun(self, ray_session, corpus, tmp_path):
        from osmptparser_ray.state.incremental import (
            sessionize_append,
            sessionize_state_read,
        )

        us, users, ids = corpus
        state = str(tmp_path / "st")
        m = us <= np.median(us)
        sessionize_append(_events(us[m], users[m], ids[m]), state, 60.0, run_id="a")
        before = _sessions(sessionize_state_read(state))
        again = sessionize_append(
            _events(us[m], users[m], ids[m]), state, 60.0, run_id="a"
        )
        assert _sessions(again) == before

    def test_untouched_user_tail_survives(self, ray_session, tmp_path):
        from osmptparser_ray.state.incremental import sessionize_append

        state = str(tmp_path / "st")
        v1 = sessionize_append(
            _events([1_000_000, 2_000_000], [1, 2], [0, 1]), state, 60.0, run_id="0"
        )
        assert len(_sessions(v1)) == 2
        # chunk 2 touches only user 1; user 2's open tail must persist
        v2 = sessionize_append(
            _events([500_000_000], [1], [2]), state, 60.0, run_id="1"
        )
        got = _sessions(v2)
        assert (2, 1, 1, 2_000_000, 2_000_000) in got
        assert sum(1 for r in got if r[0] == 1) == 2  # user 1: 2 sessions

    def test_merge_across_chunk_boundary(self, ray_session, tmp_path):
        from osmptparser_ray.state.incremental import sessionize_append

        state = str(tmp_path / "st")
        sessionize_append(
            _events([1_000_000, 10_000_000], [7, 7], [0, 1]), state, 60.0, run_id="0"
        )
        # next event 30 s after the tail end -> same session continues
        view = sessionize_append(
            _events([40_000_000], [7], [2]), state, 60.0, run_id="1"
        )
        assert _sessions(view) == [(7, 1, 3, 1_000_000, 40_000_000)]

    def test_strict_out_of_order_raises(self, ray_session, tmp_path):
        from osmptparser_ray.state.incremental import sessionize_append

        state = str(tmp_path / "st")
        sessionize_append(
            _events([100_000_000], [5], [0]), state, 60.0, run_id="0"
        )
        with pytest.raises(Exception, match="out-of-order|RayTaskError"):
            sessionize_append(
                _events([1_000_000], [5], [1]), state, 60.0, run_id="1"
            )

    def test_empty_chunk(self, ray_session, tmp_path):
        from osmptparser_ray.state.incremental import sessionize_append

        state = str(tmp_path / "st")
        v1 = sessionize_append(
            _events([1_000_000], [1], [0]), state, 60.0, run_id="0"
        )
        v2 = sessionize_append(
            _events([], [], []), state, 60.0, run_id="1"
        )
        assert _sessions(v2) == _sessions(v1)

    def test_plan_parity_broadcast_vs_shuffle(self, ray_session, corpus, tmp_path):
        from osmptparser_ray.state.incremental import sessionize_append

        us, users, ids = corpus
        cuts = np.quantile(us, [0.5])
        masks = [us <= cuts[0], us > cuts[0]]
        views = {}
        for plan in ("broadcast", "shuffle"):
            state = str(tmp_path / f"st_{plan}")
            v = None
            for i, m in enumerate(masks):
                v = sessionize_append(
                    _events(us[m], users[m], ids[m]), state, 60.0,
                    run_id=str(i), plan=plan,
                )
            views[plan] = _sessions(v)
        assert views["broadcast"] == views["shuffle"]


class TestHeavyHittersAppend:
    def _chunks(self):
        import numpy as np

        rng = np.random.default_rng(5)
        # zipf-ish stream over 40 values, 3 chunks
        vals = rng.zipf(1.6, 6000) % 40
        return [vals[:2000], vals[2000:4000], vals[4000:]]

    def test_fold_equals_batch_exact(self, ray_session, tmp_path):
        """With capacity >= distinct values the fold is exact: folding 3
        chunks == batch heavy_hitters over the concatenated stream,
        bit-for-bit, err 0."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from osmptparser_ray.stages.relational import heavy_hitters
        from osmptparser_ray.state import heavy_hitters_append

        chunks = self._chunks()
        state = str(tmp_path / "hh")
        for i, c in enumerate(chunks):
            tbl, err = heavy_hitters_append(
                rd.from_arrow(pa.table({"v": pa.array(c, pa.int64())})),
                state, "v", capacity=1024, run_id=f"c{i}",
            )
        assert err == 0
        full = rd.from_arrow(
            pa.table({"v": pa.array(np.concatenate(chunks), pa.int64())})
        )
        batch_tbl, batch_err = heavy_hitters(full, "v", k=1 << 20, capacity=1024)
        assert batch_err == 0
        assert tbl.to_pydict() == batch_tbl.to_pydict()

    def test_truncating_fold_keeps_mg_guarantee(self, ray_session, tmp_path):
        """capacity 8 << distinct 40: every folded item's lb <= true <=
        lb+err and every value with true count > err is present."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from osmptparser_ray.state import heavy_hitters_append

        chunks = self._chunks()
        state = str(tmp_path / "hh8")
        for i, c in enumerate(chunks):
            tbl, err = heavy_hitters_append(
                rd.from_arrow(pa.table({"v": pa.array(c, pa.int64())})),
                state, "v", capacity=8, run_id=f"c{i}",
            )
        allv = np.concatenate(chunks)
        items, counts = np.unique(allv, return_counts=True)
        true = dict(zip(items.tolist(), counts.tolist()))
        sk = dict(zip(tbl["v"].to_pylist(), tbl["lb"].to_pylist()))
        assert err > 0
        for v, lb in sk.items():
            assert lb <= true.get(v, 0) <= lb + err
        for v, c in true.items():
            if c > err:
                assert v in sk

    def test_idempotent_run_and_contract_errors(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd
        import pytest as pt

        from osmptparser_ray.state import (
            heavy_hitters_append,
            heavy_hitters_state_read,
        )

        state = str(tmp_path / "hh2")
        d = rd.from_arrow(pa.table({"v": pa.array([1, 1, 2], pa.int64())}))
        t1, e1 = heavy_hitters_append(d, state, "v", capacity=64, run_id="r1")
        # same run id again: no-op, state unchanged
        t2, e2 = heavy_hitters_append(d, state, "v", capacity=64, run_id="r1")
        assert t1.to_pydict() == t2.to_pydict() and e1 == e2
        got, err = heavy_hitters_state_read(state, k=1)
        assert got["v"].to_pylist() == [1] and got["lb"].to_pylist() == [2]
        with pt.raises(ValueError, match="column"):
            heavy_hitters_append(d.map_batches(
                lambda t: t.rename_columns(["w"]), batch_format="pyarrow"
            ), state, "w", capacity=64, run_id="r2")
        with pt.raises(ValueError, match="capacity"):
            heavy_hitters_append(d, state, "v", capacity=32, run_id="r3")
