"""Differential test: regex fast parser ≡ ET parser, byte-exact.

(Measured ~equal speed — ET is C-accelerated — so ET stays the default;
the regex parser serves as an independent cross-check of extraction
semantics, incl. entity unescaping and member/ref ordering.)"""

from osmptparser_ray.sources.osmxml import (
    empty_columns,
    parse_osm_payload,
    parse_osm_payload_fast,
)
from osmptparser_ray.sources.pages import synthesize_pages_table


class TestParserEquivalence:
    def test_full_fixture_corpus(self):
        t = synthesize_pages_table(replicas=2)
        a, b = empty_columns(), empty_columns()
        for p in t["text"].to_pylist():
            parse_osm_payload(p, a)
            parse_osm_payload_fast(p, b)
        assert a == b

    def test_entities_and_edge_shapes(self):
        payload = (
            '<osm version="0.6">'
            '<node id="1" lat="0.5" lon="-1.5"/>'
            '<node id="2" lat="0" lon="0" version="3" user="a &amp; b">'
            '<tag k="name" v="A &gt; B &lt; C &quot;q&quot;"/></node>'
            '<way id="3"><nd ref="1"/><nd ref="2"/><tag k="x" v="1,2&amp;3"/></way>'
            '<relation id="4"><member type="way" ref="3" role=""/>'
            '<member type="node" ref="1" role="stop_0"/></relation>'
            "</osm>"
        )
        a, b = empty_columns(), empty_columns()
        na = parse_osm_payload(payload, a)
        nb = parse_osm_payload_fast(payload, b)
        assert na == nb == 4
        assert a == b
        assert a["tags"][1] == [("name", 'A > B < C "q"')]
