"""Unit + golden tests for the geometry kernel (no Ray).

Golden values derive from the reference's integration test
(reference tests/integration_test.rs) and from decoding the reference's
fixture `tests/test.pbf` (see FIXTURES.md §2-3).
"""

import hashlib
import json

import numpy as np
import pytest

from osmptparser_ray.fixtures import load_osm_fixture, resolved_relation_ways
from osmptparser_ray.kernel import (
    BROKEN,
    JOINED,
    NodeSeq,
    OK,
    SORTED,
    close_linestring,
    edge_distance,
    first_pass,
    flatten_relation,
    flatten_single_way,
    flatten_ways,
    haversine_m,
    haversine_m_vec,
    join_ways,
    point_distance,
    sort_ways,
)

# ~1e-4 deg lat ≈ 11 m; handy for tolerance tests
def seq(*nodes):
    ids = [n[0] for n in nodes]
    lats = [n[1] for n in nodes]
    lons = [n[2] for n in nodes]
    return NodeSeq.build(ids, lats, lons)


class TestPrimitives:
    def test_point_distance_degrees(self):
        assert point_distance(0.0, 0.0, 3.0, 4.0) == 5.0

    def test_edge_distance_is_constant_minus_one(self):
        # reference bug: fold seeded with -1.0 under min semantics
        a = seq((1, 0.0, 0.0), (2, 1.0, 1.0))
        b = seq((3, 5.0, 5.0), (4, 9.0, 9.0))
        assert edge_distance(a, b) == -1.0

    def test_haversine_quito(self):
        # ~1 degree of latitude at the equator ≈ 111.19 km
        d = haversine_m(0.0, -78.5, 1.0, -78.5)
        assert abs(d - 111_194.9) < 10.0

    def test_haversine_vec_matches_scalar(self):
        lats1 = np.array([0.0, -2.15])
        lons1 = np.array([-78.5, -79.93])
        lats2 = np.array([1.0, -2.16])
        lons2 = np.array([-78.6, -79.95])
        vec = haversine_m_vec(lats1, lons1, lats2, lons2)
        for i in range(2):
            assert vec[i] == pytest.approx(haversine_m(lats1[i], lons1[i], lats2[i], lons2[i]))


class TestFirstPass:
    def test_aligned_merge(self):
        # FIXTURES.md §3.1: two ways sharing an endpoint id, aligned
        a = seq((1, 0.0, 0.0), (2, 0.0, 1.0))
        b = seq((2, 0.0, 1.0), (3, 0.0, 2.0))
        out = first_pass([a, b])
        assert len(out) == 1
        assert out[0].ids.tolist() == [1, 2, 3]  # shared node deduped

    def test_reversed_second_way(self):
        a = seq((1, 0.0, 0.0), (2, 0.0, 1.0))
        b = seq((3, 0.0, 2.0), (2, 0.0, 1.0))  # reversed
        out = first_pass([a, b])
        assert len(out) == 1
        assert out[0].ids.tolist() == [1, 2, 3]

    def test_head_reversal_branch(self):
        # first way needs reversal: (2,1) then (2,3): way b touches prev[0]=2
        a = seq((2, 0.0, 1.0), (1, 0.0, 0.0))
        b = seq((2, 0.0, 1.0), (3, 0.0, 2.0))
        out = first_pass([a, b])
        assert len(out) == 1
        assert out[0].ids.tolist() == [1, 2, 3]

    def test_head_reversal_only_for_untouched_head(self):
        # after a merge the accumulated segment != ways[i-1] ⇒ no head flip
        a = seq((1, 0.0, 0.0), (2, 0.0, 1.0))
        b = seq((2, 0.0, 1.0), (3, 0.0, 2.0))
        c = seq((1, 0.0, 0.0), (9, 0.0, 9.0))  # touches head id 1, but guard fails
        out = first_pass([a, b, c])
        assert len(out) == 2

    def test_disjoint_stay_separate(self):
        a = seq((1, 0.0, 0.0), (2, 0.0, 1.0))
        b = seq((5, 5.0, 5.0), (6, 5.0, 6.0))
        assert len(first_pass([a, b])) == 2


class TestSortWays:
    def test_identity(self):
        ways = [
            seq((1, 0.0, 0.0), (2, 0.0, 1.0)),
            seq((9, 9.0, 9.0), (10, 9.0, 10.0)),
            seq((2, 0.0, 1.0), (3, 0.0, 2.0)),
        ]
        out = sort_ways(ways)
        assert [w.ids.tolist() for w in out] == [w.ids.tolist() for w in ways]


class TestJoinWays:
    def test_gap_within_tolerance_keeps_both_endpoints(self):
        # FIXTURES.md §3.4: disjoint ids, endpoints < tolerance ⇒ joined, no dedup
        a = seq((1, 0.0, 0.0), (2, 0.0, 0.001))
        b = seq((3, 0.0, 0.0011), (4, 0.0, 0.002))  # ~11m gap
        out = join_ways([a, b], 50.0)
        assert len(out) == 1
        assert out[0].ids.tolist() == [1, 2, 3, 4]  # both junction nodes kept

    def test_gap_beyond_tolerance(self):
        a = seq((1, 0.0, 0.0), (2, 0.0, 0.001))
        b = seq((3, 0.0, 0.01), (4, 0.0, 0.02))  # ~1km gap
        out = join_ways([a, b], 50.0)
        assert len(out) == 2

    def test_reverse_combos(self):
        # accumulated-last reversed to meet the next way
        a = seq((2, 0.0, 0.001), (1, 0.0, 0.0))  # head at lon 0.001
        b = seq((3, 0.0, 0.0011), (4, 0.0, 0.002))
        out = join_ways([a, b], 50.0)
        assert len(out) == 1
        assert out[0].ids.tolist() == [1, 2, 3, 4]


class TestFlattenCascade:
    def test_empty_is_broken(self):
        segs, st = flatten_ways([], 150.0)
        assert segs == [] and st.code == BROKEN

    def test_ok_path(self):
        a = seq((1, 0.0, 0.0), (2, 0.0, 1.0))
        b = seq((2, 0.0, 1.0), (3, 0.0, 2.0))
        segs, st = flatten_ways([a, b], 150.0)
        assert st.code == OK and len(segs) == 1

    def test_sorted_path_double_first_pass(self):
        # FIXTURES.md §3.5: mergeable only after a second first_pass.
        # Pass 1 merges (a,b) and (c,d) into two segments that then merge.
        a = seq((1, 0.0, 0.0), (2, 0.0, 1.0))
        c = seq((3, 0.0, 2.0), (2, 0.0, 1.0))  # reversed-at-end merge to [1,2,3]
        b = seq((5, 0.0, 4.0), (4, 0.0, 3.0))
        d = seq((3, 0.0, 2.0), (99, 1.0, 1.0))
        # construct: first_pass([a, c, b, d]):
        #   a+c -> [1,2,3]; b stays [5,4]; d: [3,99] does not touch [5,4] tail
        # second pass over [[1,2,3],[5,4],[3,99]]... still 3 — need a real case:
        s1 = seq((1, 0.0, 0.0), (2, 0.0, 1.0))
        s2 = seq((4, 0.0, 3.0), (3, 0.0, 2.0))
        s3 = seq((2, 0.0, 1.0), (3, 0.0, 2.0))
        # pass1: s1 | s2 (no touch) then s3: tail of s2 is 3; s3 ends with 3 →
        # s2+reversed(s3) = [4,3,2]; result [[1,2],[4,3,2]]
        p1 = first_pass([s1, s2, s3])
        assert [w.ids.tolist() for w in p1] == [[1, 2], [4, 3, 2]]
        # pass2: [1,2] then [4,3,2]: tail 2 == way[-1]=2 → merge [1,2,3,4]
        segs, st = flatten_ways([s1, s2, s3], 150.0)
        assert st.code == SORTED
        assert segs[0].ids.tolist() == [1, 2, 3, 4]

    def test_joined_path(self):
        a = seq((1, 0.0, 0.0), (2, 0.0, 0.001))
        b = seq((3, 0.0, 0.0011), (4, 0.0, 0.002))
        segs, st = flatten_ways([a, b], 50.0)
        assert st.code == JOINED and len(segs) == 1

    def test_broken_empty_geometry(self):
        a = seq((1, 0.0, 0.0), (2, 0.0, 0.001))
        b = seq((3, 5.0, 5.0), (4, 5.0, 6.0))
        segs, st = flatten_ways([a, b], 50.0)
        assert st.code == BROKEN and segs == []


class TestCloseLinestring:
    def test_already_closed_by_id(self):
        ring = seq((1, 0.0, 0.0), (2, 0.0, 0.001), (3, 0.001, 0.001), (1, 0.0, 0.0))
        out, st = close_linestring(ring, 50.0)
        assert st.code == OK and out.ids.tolist() == [1, 2, 3, 1]

    def test_closable_within_tolerance(self):
        ring = seq((1, 0.0, 0.0), (2, 0.0, 0.001), (3, 0.0001, 0.0001))
        out, st = close_linestring(ring, 50.0)
        assert st.code == JOINED
        assert out.ids.tolist() == [1, 2, 3, 1]
        assert out.lats[-1] == out.lats[0] and out.lons[-1] == out.lons[0]

    def test_open_is_broken_empty(self):
        ring = seq((1, 0.0, 0.0), (2, 0.0, 0.001), (3, 0.5, 0.5))
        out, st = close_linestring(ring, 50.0)
        assert st.code == BROKEN and len(out) == 0

    def test_tolerance_is_inclusive(self):
        # close_linestring uses <= (reference relation.rs:264) vs join_ways' <
        a = seq((1, 0.0, 0.0), (2, 0.0, 0.001))
        d = haversine_m(0.0, 0.0, 0.0, 0.001)
        out, st = close_linestring(a, d)
        assert st.code == JOINED


class TestFlattenRelationClosed:
    def test_closed_status_merge_sticky_broken(self):
        ok_ring = seq((1, 0.0, 0.0), (2, 0.0, 0.001), (1, 0.0, 0.0))
        open_way = seq((5, 5.0, 5.0), (6, 6.0, 6.0))
        segs, st = flatten_relation([ok_ring, open_way], 1e-9, True)
        # two disjoint segments, neither closable at tiny tolerance in one case
        assert st.code == BROKEN

    def test_closed_last_ring_wins(self):
        # NOTE: flatten_ways only ever yields one segment (or empty+501), so
        # the multi-ring merge loop (relation.rs:286-299) is reachable only
        # with a single ring end-to-end; we test its literal merge semantics
        # directly: ring1 needs closing (102), ring2 closed by id (0) ⇒ the
        # LAST ring's status wins ⇒ final 0.
        from osmptparser_ray.kernel.geometry import _close_all
        from osmptparser_ray.kernel.status import ParseStatus

        r1 = seq((1, 0.0, 0.0), (2, 0.0, 0.0001), (3, 0.00005, 0.00005))
        r2 = seq((7, 5.0, 5.0), (8, 5.0, 5.0001), (7, 5.0, 5.0))
        segs, st = _close_all([r1, r2], ParseStatus.ok(), 50.0)
        assert len(segs) == 2
        assert st.code == OK
        # sticky 501: one open ring poisons the merge even if a later ring is OK
        far = seq((9, 9.0, 9.0), (10, 8.0, 8.0))
        segs, st = _close_all([far, r2], ParseStatus.ok(), 50.0)
        assert st.code == BROKEN

    def test_closed_single_ring_end_to_end(self):
        # two ways forming a closable ring: merge (status 0) then close (102)
        a = seq((1, 0.0, 0.0), (2, 0.0, 0.0001), (3, 0.0001, 0.0001))
        b = seq((3, 0.0001, 0.0001), (4, 0.0001, 0.0))
        segs, st = flatten_relation([a, b], 50.0, True)
        assert st.code == JOINED
        assert segs[0].ids.tolist() == [1, 2, 3, 4, 1]

    def test_single_way_closed(self):
        ring = seq((1, 0.0, 0.0), (2, 0.0, 0.0001), (3, 0.0001, 0.0001))
        segs, st = flatten_single_way(ring, 50.0, True)
        assert st.code == JOINED
        assert segs[0].ids.tolist() == [1, 2, 3, 1]


class TestFixtureGolden:
    """End-to-end kernel goldens from the decoded reference fixture."""

    @pytest.fixture(scope="class")
    def fx(self):
        return load_osm_fixture()

    def _seqs(self, fx, rid):
        return [
            NodeSeq.build(w["node_ids"], w["lats"], w["lons"])
            for w in resolved_relation_ways(fx, rid)
        ]

    def test_fixture_shape(self, fx):
        assert len(fx["nodes"]) == 563
        assert len(fx["ways"]) == 126
        assert len(fx["relations"]) == 2

    def test_2030162_single_90_node_line(self, fx):
        segs, st = flatten_relation(self._seqs(fx, 2030162), 1500.0, False)
        assert st.code == OK
        assert len(segs) == 1 and len(segs[0]) == 90
        coords = [(float(lon), float(lat)) for lon, lat in zip(segs[0].lons, segs[0].lats)]
        assert coords[0] == (-79.93008490000001, -2.1555106)
        assert coords[-1] == (-79.9527625, -2.1522622)
        md5 = hashlib.md5(json.dumps(coords).encode()).hexdigest()
        assert md5 == "5f2c2cb539fcaa715a03eba1f887a2a4"

    def test_85965_broken_role_blind(self, fx):
        ways = self._seqs(fx, 85965)
        assert len(ways) == 106  # platform ways included (role-blind, F7)
        assert len(first_pass(ways)) == 26
        assert len(join_ways(first_pass(ways), 1500.0)) == 2
        for gap in (150.0, 1500.0):
            segs, st = flatten_relation(ways, gap, False)
            assert st.code == BROKEN and segs == []

    def test_85965_without_platforms_would_merge(self, fx):
        # negative control: dropping the 13 trailing platform ways lets the
        # route flatten — proves role-blind inclusion is observable behavior
        rel = next(r for r in fx["relations"] if r["id"] == 85965)
        way_members = [m for m in rel["members"] if m["mtype"] == 1]
        non_platform = {m["ref"] for m in way_members if m["role"] != "platform"}
        ways = [
            NodeSeq.build(w["node_ids"], w["lats"], w["lons"])
            for w in resolved_relation_ways(fx, 85965)
            if w["id"] in non_platform
        ]
        segs, st = flatten_relation(ways, 1500.0, False)
        assert st.code == JOINED
        assert len(segs) == 1 and len(segs[0]) == 417
