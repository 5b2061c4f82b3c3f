"""Property-based tests (hypothesis) for the kernel and the filter DSL."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osmptparser_ray.kernel import NodeSeq, TagFilter, first_pass, flatten_ways, join_ways
from osmptparser_ray.kernel.geometry import haversine_m
from osmptparser_ray.spatial.cell import cell_parent, encode_cell
from osmptparser_ray.spatial.pip import points_in_ring

# --- strategies -----------------------------------------------------------

coord = st.floats(min_value=-80.0, max_value=80.0, allow_nan=False, width=64)


@st.composite
def node_seq(draw, min_nodes=2, max_nodes=6):
    n = draw(st.integers(min_nodes, max_nodes))
    ids = draw(
        st.lists(st.integers(1, 10_000), min_size=n, max_size=n, unique=True)
    )
    lats = [draw(coord) for _ in range(n)]
    lons = [draw(coord) for _ in range(n)]
    return NodeSeq.build(ids, lats, lons)


@st.composite
def way_list(draw):
    k = draw(st.integers(1, 5))
    return [draw(node_seq()) for _ in range(k)]


class TestKernelProperties:
    @settings(max_examples=60, deadline=None)
    @given(way_list())
    def test_first_pass_preserves_node_multiset_endpoints(self, ways):
        """first_pass only merges at shared endpoint ids; total node count
        shrinks by exactly the number of merges performed."""
        out = first_pass(ways)
        merges = len(ways) - len(out)
        assert merges >= 0
        n_in = sum(len(w) for w in ways)
        n_out = sum(len(w) for w in out)
        assert n_out == n_in - merges  # each merge dedups exactly one node

    @settings(max_examples=60, deadline=None)
    @given(way_list(), st.floats(min_value=0.0, max_value=1e7, allow_nan=False))
    def test_join_ways_never_increases_segments(self, ways, tol):
        out = join_ways(ways, tol)
        assert 1 <= len(out) <= len(ways)
        # no node is lost in join_ways (no dedup at junctions)
        assert sum(len(w) for w in out) == sum(len(w) for w in ways)

    @settings(max_examples=60, deadline=None)
    @given(way_list(), st.floats(min_value=0.0, max_value=1e6, allow_nan=False))
    def test_flatten_invariant(self, ways, tol):
        """flatten yields exactly one segment (codes 0/101/102/103) or an
        empty geometry with 501 — never partial multi-segment output."""
        segs, status = flatten_ways(ways, tol)
        if status.code == 501:
            assert segs == []
        else:
            assert len(segs) == 1

    @settings(max_examples=60, deadline=None)
    @given(node_seq(min_nodes=2, max_nodes=2), node_seq(min_nodes=2, max_nodes=2))
    def test_haversine_symmetry(self, a, b):
        d1 = haversine_m(a.lats[0], a.lons[0], b.lats[0], b.lons[0])
        d2 = haversine_m(b.lats[0], b.lons[0], a.lats[0], a.lons[0])
        assert abs(d1 - d2) < 1e-9
        assert d1 >= 0.0


tag_key = st.text(alphabet="abcxyz_", min_size=1, max_size=5)
tag_val = st.text(alphabet="abcxyz0123,", min_size=0, max_size=6)


class TestFilterProperties:
    @settings(max_examples=100, deadline=None)
    @given(
        st.dictionaries(tag_key, st.text(alphabet="abcxyz01", max_size=5), max_size=5),
        tag_key,
    )
    def test_bare_key_equals_membership(self, tags, key):
        assert TagFilter(key).matches(tags) == (key in tags)

    @settings(max_examples=100, deadline=None)
    @given(
        st.dictionaries(tag_key, st.text(alphabet="abcxyz01", max_size=5), max_size=5),
        st.lists(tag_key, min_size=1, max_size=3, unique=True),
    )
    def test_conjunction_is_and(self, tags, keys):
        cond = "&".join(keys)
        assert TagFilter(cond).matches(tags) == all(k in tags for k in keys)

    @settings(max_examples=100, deadline=None)
    @given(
        st.dictionaries(tag_key, st.text(alphabet="abcxyz01", max_size=5), max_size=6)
    )
    def test_vectorized_equals_scalar(self, tags):
        import pyarrow as pa

        from osmptparser_ray.kernel.filters import dicts_to_map_array

        t = pa.table({"tags": dicts_to_map_array([tags, {}, dict(tags, extra="1")])})
        for cond in ["a", "a=b", "a=b,c&x"]:
            f = TagFilter(cond)
            mask = f.mask_table(t)
            assert mask.tolist() == [
                f.matches(tags),
                f.matches({}),
                f.matches(dict(tags, extra="1")),
            ]


class TestSpatialProperties:
    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(coord, st.floats(-179.0, 179.0, allow_nan=False)),
            min_size=1,
            max_size=50,
        ),
        st.integers(1, 20),
    )
    def test_parent_consistency(self, pts, level):
        lats = np.array([p[0] for p in pts])
        lons = np.array([p[1] for p in pts])
        fine = encode_cell(lats, lons, level)
        if level >= 1:
            coarse = encode_cell(lats, lons, level - 1)
            assert (cell_parent(fine, 1) == coarse).all()

    @settings(max_examples=40, deadline=None)
    @given(
        st.floats(-10.0, 10.0, allow_nan=False),
        st.floats(-10.0, 10.0, allow_nan=False),
        st.floats(0.1, 5.0, allow_nan=False),
    )
    def test_rect_pip_matches_bounds(self, clat, clon, r):
        ry = np.array([clat - r, clat - r, clat + r, clat + r])
        rx = np.array([clon - r, clon + r, clon + r, clon - r])
        rng = np.random.default_rng(0)
        lats = rng.uniform(clat - 2 * r, clat + 2 * r, 200)
        lons = rng.uniform(clon - 2 * r, clon + 2 * r, 200)
        got = points_in_ring(lats, lons, ry, rx)
        want = (
            (lats > clat - r) & (lats < clat + r) & (lons > clon - r) & (lons < clon + r)
        )
        # boundary-coincident points excluded from comparison
        on_edge = (
            np.isclose(lats, clat - r) | np.isclose(lats, clat + r)
            | np.isclose(lons, clon - r) | np.isclose(lons, clon + r)
        )
        assert (got[~on_edge] == want[~on_edge]).all()
