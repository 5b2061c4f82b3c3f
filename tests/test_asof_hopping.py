"""asof_join (distributed boundary-chained scan) + hopping_window
(round-3 custom operators): brute-force oracles incl. block-straddling
keys, equal-timestamp ties, and unmatched lefts."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmptparser_ray.streams import asof_join, hopping_window


def _mk(left_rows, right_rows):
    def tab(rows):
        return pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "value": pa.array([float(r[0]) for r in rows], pa.float64()),
            }
        )

    return rd.from_arrow(tab(left_rows)), rd.from_arrow(tab(right_rows))


def _brute(left_rows, right_rows):
    out = {}
    for lid, lts, lu in left_rows:
        best = None
        for rid, rts, ru in right_rows:
            if ru == lu and rts <= lts:
                if best is None or (rts, rid) > (best[1], best[0]):
                    best = (rid, rts)
        out[lid] = best[0] if best else None
    return out


class TestAsofJoin:
    def test_basic_with_unmatched_and_ties(self, ray_session):
        left = [(1, 100, 7), (2, 200, 7), (3, 50, 7), (4, 500, 9)]
        right = [(10, 100, 7), (11, 150, 7), (12, 100, 7), (20, 600, 9)]
        l, r = _mk(left, right)
        got = {
            row["event_id"]: row["event_id_r"]
            for row in asof_join(l, r).take_all()
        }
        # at ts=100 user 7 has two right rows (10, 12): larger event_id wins
        assert got == _brute(left, right)
        assert got[1] == 12 and got[2] == 11 and got[3] is None and got[4] is None

    def test_hot_key_spans_blocks(self, ray_session):
        """One user, interleaved left/right across 2000 events and 16
        blocks: the boundary chain must carry the running right row."""
        rng = np.random.default_rng(5)
        left_rows, right_rows = [], []
        eid = 0
        for t in np.cumsum(rng.integers(1, 100, 2000)).tolist():
            if rng.random() < 0.3:
                right_rows.append((eid, t, 1))
            else:
                left_rows.append((eid, t, 1))
            eid += 1
        l, r = _mk(left_rows, right_rows)
        l = l.repartition(16)
        r = r.repartition(16)
        got = {
            row["event_id"]: row["event_id_r"]
            for row in asof_join(l, r).take_all()
        }
        assert got == _brute(left_rows, right_rows)

    def test_multi_user_shuffled(self, ray_session):
        rng = np.random.default_rng(9)
        left_rows, right_rows = [], []
        eid = 0
        for u in range(20):
            for t in np.cumsum(rng.integers(1, 1000, 30)).tolist():
                (left_rows if rng.random() < 0.6 else right_rows).append((eid, t, u))
                eid += 1
        rng.shuffle(left_rows)
        rng.shuffle(right_rows)
        l, r = _mk(left_rows, right_rows)
        got = {
            row["event_id"]: row["event_id_r"]
            for row in asof_join(l.repartition(8), r.repartition(8)).take_all()
        }
        assert got == _brute(left_rows, right_rows)


class TestHoppingWindow:
    def test_equals_tumbling_when_hop_is_window(self, ray_session):
        from osmptparser_ray.streams import tumbling_window

        rng = np.random.default_rng(2)
        n = 500
        t = pa.table(
            {
                "user_id": pa.array(rng.integers(0, 5, n), pa.int64()),
                "ts": pa.array(
                    (np.cumsum(rng.integers(1, 10**7, n))).tolist(), pa.timestamp("us")
                ),
                "value": pa.array(rng.random(n), pa.float64()),
            }
        )
        ev = rd.from_arrow(t)
        a = sorted(
            (r["user_id"], r["window_id"], r["n_events"], round(r["sum_value"], 9))
            for r in hopping_window(ev, 60, 60).take_all()
        )
        b = sorted(
            (r["user_id"], r["window_id"], r["n_events"], round(r["sum_value"], 9))
            for r in tumbling_window(ev, 60).take_all()
        )
        assert a == b

    def test_replication_factor(self, ray_session):
        # one event, window 4×hop ⇒ exactly 4 windows
        t = pa.table(
            {
                "user_id": pa.array([1], pa.int64()),
                "ts": pa.array([10_000_000], pa.timestamp("us")),
                "value": pa.array([2.0], pa.float64()),
            }
        )
        rows = hopping_window(rd.from_arrow(t), 40, 10).take_all()
        assert len(rows) == 4
        assert all(r["n_events"] == 1 and r["sum_value"] == 2.0 for r in rows)

    def test_non_divisible_hop_rejected(self, ray_session):
        import pytest

        t = pa.table(
            {
                "user_id": pa.array([1], pa.int64()),
                "ts": pa.array([0], pa.timestamp("us")),
                "value": pa.array([1.0], pa.float64()),
            }
        )
        with pytest.raises(ValueError):
            hopping_window(rd.from_arrow(t), 50, 15)


class TestIntervalJoin:
    def test_overlapping_bands_brute_force(self, ray_session):
        from osmptparser_ray.stages.relational import interval_join

        rng = np.random.default_rng(4)
        vals = rng.random(2000) * 30 - 5  # include out-of-range values
        t = pa.table(
            {
                "event_id": pa.array(np.arange(2000), pa.int64()),
                "value": pa.array(vals, pa.float64()),
            }
        )
        bands = [(i, i * 1.5, i * 1.5 + 4.0) for i in range(15)]
        got = sorted(
            (r["event_id"], r["interval_id"])
            for r in interval_join(rd.from_arrow(t), bands).take_all()
        )
        want = sorted(
            (int(e), b)
            for e, v in enumerate(vals)
            for b, lo, hi in bands
            if lo <= v < hi
        )
        assert got == want

    def test_degenerate_and_empty_intervals(self, ray_session):
        from osmptparser_ray.stages.relational import interval_join

        t = pa.table(
            {
                "event_id": pa.array([0, 1], pa.int64()),
                "value": pa.array([1.0, 5.0], pa.float64()),
            }
        )
        # hi <= lo intervals dropped; exact-boundary semantics lo<=v<hi
        bands = [(0, 1.0, 1.0), (1, 0.5, 1.0), (2, 1.0, 1.5), (3, 5.0, 5.0001)]
        got = sorted(
            (r["event_id"], r["interval_id"])
            for r in interval_join(rd.from_arrow(t), bands).take_all()
        )
        assert got == [(0, 2), (1, 3)]


class TestExactQuantiles:
    def test_matches_numpy_on_random_data(self, ray_session):
        from osmptparser_ray.stages.relational import exact_quantiles

        rng = np.random.default_rng(11)
        vals = rng.random(5000) * 100
        ds = rd.from_arrow(
            pa.table({"v": pa.array(vals, pa.float64())})
        ).repartition(16)
        qs = [0.0, 0.01, 0.5, 0.75, 1.0]
        out = exact_quantiles(ds, "v", qs).to_pydict()
        srt = np.sort(vals)
        for q, got in zip(out["q"], out["value"]):
            rank = min(max(int(np.ceil(q * len(srt))) - 1, 0), len(srt) - 1)
            assert got == srt[rank], q

    def test_empty(self, ray_session):
        from osmptparser_ray.stages.relational import exact_quantiles

        ds = rd.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
        out = exact_quantiles(ds, "v", [0.5]).to_pydict()
        assert out["value"] == [None]
