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
