"""Tag-filter DSL tests (FIXTURES.md §4) — scalar + vectorized forms."""

import numpy as np
import pyarrow as pa

from osmptparser_ray.fixtures import load_osm_fixture
from osmptparser_ray.kernel import AA, PTV2, PTV2_LITERAL, TagFilter
from osmptparser_ray.kernel.filters import (
    dicts_to_map_array,
    get_tag_values,
    map_column_to_dicts,
)

TAGS = [
    {"name": "a", "route": "bus", "extra": "1"},
    {"name": "b", "route": "taxi"},
    {"route": "bus"},
    {"name": "c", "route_master": "bus", "route": "tram"},
    {},
]


def table(tag_dicts):
    return pa.table({"id": list(range(len(tag_dicts))), "tags": dicts_to_map_array(tag_dicts)})


class TestScalar:
    def test_bare_key_presence(self):
        f = TagFilter("name")
        assert f.matches(TAGS[0]) and f.matches(TAGS[1]) and not f.matches(TAGS[2])

    def test_key_value(self):
        f = TagFilter("route=bus")
        assert f.matches(TAGS[0]) and not f.matches(TAGS[1]) and f.matches(TAGS[2])

    def test_or_values(self):
        f = TagFilter("route=bus,tram")
        assert f.matches(TAGS[0]) and f.matches(TAGS[3]) and not f.matches(TAGS[1])

    def test_conjunction(self):
        f = TagFilter("name&route=bus")
        assert f.matches(TAGS[0]) and not f.matches(TAGS[2]) and not f.matches(TAGS[3])

    def test_missing_key_rejects(self):
        assert not TagFilter("nope").matches(TAGS[0])

    def test_empty_filter_selects_nothing(self):
        # "".split('&') == [""] ⇒ conjunct with empty key ⇒ always false
        f = TagFilter("")
        assert not any(f.matches(t) for t in TAGS)

    def test_double_equals_uses_first_piece_only(self):
        f = TagFilter("k=a=b")
        assert f.matches({"k": "a"}) and not f.matches({"k": "a=b"})

    def test_presets(self):
        fx = load_osm_fixture()
        ptv2 = TagFilter(PTV2)
        selected = [r["id"] for r in fx["relations"] if ptv2.matches(r["tags"])]
        assert sorted(selected) == [85965, 2030162]
        # the literal preset (with route_master) selects NEITHER fixture
        # relation — the documented SURVEY §2.8 discrepancy
        literal = TagFilter(PTV2_LITERAL)
        assert not any(literal.matches(r["tags"]) for r in fx["relations"])
        aa = TagFilter(AA)
        assert aa.matches({"name": "x", "admin_level": "4", "boundary": "administrative"})
        assert not aa.matches({"name": "x", "boundary": "administrative"})


class TestVectorized:
    def test_mask_matches_scalar(self):
        t = table(TAGS)
        for cond in ["name", "route=bus", "route=bus,tram", "name&route=bus", "nope", ""]:
            f = TagFilter(cond)
            mask = f.mask_table(t)
            expected = np.array([f.matches(d) for d in TAGS])
            assert mask.tolist() == expected.tolist(), cond

    def test_filter_table(self):
        t = table(TAGS)
        out = TagFilter("route=bus").filter_table(t)
        assert out["id"].to_pylist() == [0, 2]

    def test_roundtrip_map_dicts(self):
        t = table(TAGS)
        assert map_column_to_dicts(t["tags"]) == TAGS

    def test_get_tag_values(self):
        t = table(TAGS)
        vals = get_tag_values(t, "route")
        assert vals.tolist() == ["bus", "taxi", "bus", "tram", None]

    def test_duplicate_key_first_occurrence(self):
        """Arrow maps (and XML <tag> children) may carry duplicate keys; a
        value conjunct must check only each row's FIRST occurrence of the
        key (reference tags().find, mod.rs:93) — a later matching
        duplicate must not rescue the row."""
        col = pa.array(
            [
                [("name", "a"), ("route", "ferry"), ("route", "bus")],
                [("name", "b"), ("route", "bus"), ("route", "ferry")],
                [("name", "c"), ("route", "bus")],
            ],
            type=pa.map_(pa.string(), pa.string()),
        )
        t = pa.table({"id": pa.array([0, 1, 2]), "tags": col})
        assert TagFilter("name&route=bus").mask_table(t).tolist() == [False, True, True]
        # presence-only conjuncts are occurrence-agnostic
        assert TagFilter("route").mask_table(t).tolist() == [True, True, True]

    def test_fixture_scale_mask(self):
        fx = load_osm_fixture()
        t = table([w["tags"] for w in fx["ways"]])
        f = TagFilter("highway")
        mask = f.mask_table(t)
        expected = [f.matches(w["tags"]) for w in fx["ways"]]
        assert mask.tolist() == expected
