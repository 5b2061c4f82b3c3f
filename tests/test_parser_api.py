"""Parser-surface parity (J5/P2/P5/A5) + stream operators."""

import numpy as np
import pytest

from osmptparser_ray.sources import synthesize_pages_parquet


@pytest.fixture(scope="module")
def tables(ray_session, tmp_path_factory):
    from osmptparser_ray.kernel.filters import PTV2
    from osmptparser_ray.pipelines.ptv2 import parser_tables_from_pages

    p = tmp_path_factory.mktemp("pages_api") / "pages.parquet"
    synthesize_pages_parquet(str(p), replicas=1)
    return parser_tables_from_pages(str(p), PTV2)


class TestParserApi:
    def test_get_relation_by_id(self, tables):
        from osmptparser_ray.pipelines.parser_api import get_relation_by_id

        r = get_relation_by_id(tables, 2030162)
        assert r is not None
        assert dict(r["tags"])["name"] == "B6 Mapasingue Oeste Ida"
        assert len(r["ways"]) == 20
        assert len(r["stops"]) == 1
        # missing id → None (reference panics on unwrap; we return None)
        assert get_relation_by_id(tables, 999999) is None

    def test_iter_relations(self, tables):
        from osmptparser_ray.pipelines.parser_api import iter_relations

        rows = list(iter_relations(tables))
        assert sorted(r["id"] for r in rows) == [85965, 2030162]
        big = next(r for r in rows if r["id"] == 85965)
        assert len(big["ways"]) == 106

    def test_par_map(self, tables):
        from osmptparser_ray.pipelines.parser_api import par_map_relations

        out = par_map_relations(
            tables,
            lambda r: {"id": r["id"], "total_nodes": sum(len(w["node_ids"]) for w in r["ways"])},
        )
        got = {r["id"]: r["total_nodes"] for r in out.take_all()}
        assert got[85965] == 575 and got[2030162] == 109

    def test_parser_summary(self, tables):
        from osmptparser_ray.pipelines.parser_api import parser_summary

        t = parser_summary(tables)
        rows = {r["id"]: r for r in t.to_pylist()}
        assert rows[85965]["n_ways"] == 106
        assert rows[85965]["n_stops"] == 31
        assert rows[85965]["n_nodes"] == 575
        assert rows[2030162]["n_nodes"] == 109


class TestStreams:
    def test_sessionize_gaps(self, ray_session):
        import datetime

        import pyarrow as pa
        import ray.data as rd

        from osmptparser_ray.streams import sessionize

        base = datetime.datetime(2024, 1, 1)
        rows = []
        # user 1: two sessions (gap of 2h between event 2 and 3)
        for i, off in enumerate([0, 600, 7800, 8000]):
            rows.append({"event_id": i, "user_id": 1, "ts": base + datetime.timedelta(seconds=off)})
        # user 2: one session
        rows.append({"event_id": 10, "user_id": 2, "ts": base})
        ds = rd.from_arrow(
            pa.table(
                {
                    "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
                    "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
                    "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
                }
            )
        )
        out = sessionize(ds, gap_seconds=1800.0).take_all()
        by_user = {}
        for r in out:
            by_user.setdefault(r["user_id"], []).append(r)
        u1 = sorted(by_user[1], key=lambda r: r["session_id"])
        assert [r["n_events"] for r in u1] == [2, 2]
        assert len(by_user[2]) == 1

    def test_tumbling_window(self, ray_session, sf_dir):
        import ray.data as rd

        from osmptparser_ray.streams import tumbling_window

        ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
        out = tumbling_window(ev, 3600.0)
        rows = out.take_all()
        assert len(rows) > 0
        assert all(r["n_events"] >= 1 for r in rows)


class TestShardedNodeIndex:
    def test_matches_unsharded(self, ray_session):
        """gather/stops_bulk parity between the driver-built NodeIndex and
        the object-store-sharded variant, including last-wins dedup and
        missing-id drops."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from osmptparser_ray.kernel.filters import dicts_to_map_array
        from osmptparser_ray.stages.assemble import (
            build_node_index,
            build_node_index_sharded,
        )

        rng = np.random.default_rng(6)
        ids = rng.integers(0, 500, size=400).astype(np.int64)  # duplicates on purpose
        lats = rng.uniform(-3, -2, 400)
        lons = rng.uniform(-80, -79, 400)
        tags = [{"name": f"n{i}"} for i in ids]
        tbl = pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "lat": pa.array(lats, pa.float64()),
                "lon": pa.array(lons, pa.float64()),
                "tags": dicts_to_map_array(tags),
            }
        )
        # several blocks so last-wins crosses block boundaries
        nodes = rd.from_arrow([tbl.slice(i, 100) for i in range(0, 400, 100)])
        stop_ids = np.unique(ids[::3])
        a = build_node_index(nodes, stop_ids)
        b = build_node_index_sharded(nodes, stop_ids, num_shards=4)

        probe = np.concatenate([np.unique(ids), np.array([100000, -5], np.int64)])
        ga = a.gather(probe)
        gb = b.gather(probe)
        for x, y in zip(ga, gb):
            assert np.array_equal(np.asarray(x), np.asarray(y))

        sa = a.stops_bulk(probe)
        sb = b.stops_bulk(probe)
        assert np.array_equal(sa[0], sb[0])
        assert np.allclose(sa[1], sb[1]) and np.allclose(sa[2], sb[2])
        assert [dict(t) for t in sa[3]] == [dict(t) for t in sb[3]]
