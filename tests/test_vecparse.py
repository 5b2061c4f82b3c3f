"""Differential + contract tests for the vectorized batch parser
(sources.vecparse) — the round-3 extraction fast path.

The vec parser must be BYTE-IDENTICAL to the scalar ET parser on every
payload inside its dialect contract, and must refuse (VecContractError →
scalar fallback) anything outside it rather than silently diverging.
"""

import numpy as np
import pyarrow as pa
import pytest

from osmptparser_ray.sources.extract import OsmPayloadExtractor
from osmptparser_ray.sources.osmxml import (
    columns_to_table,
    empty_columns,
    parse_osm_payload,
)
from osmptparser_ray.sources.pages import synthesize_pages_table
from osmptparser_ray.sources.vecparse import (
    VecContractError,
    extract_payloads,
    parse_payload_batch,
)


def _et_table(payloads):
    cols = empty_columns()
    counts = [parse_osm_payload(p, cols) for p in payloads]
    return columns_to_table(cols), counts


def _vec_table(payloads):
    return parse_payload_batch(pa.array(payloads, pa.string()))


class TestVecParity:
    def test_full_fixture_corpus_byte_identical(self):
        t = synthesize_pages_table(replicas=2)
        payloads = t["text"].to_pylist()
        vec, page_idx = _vec_table(payloads)
        et, counts = _et_table(payloads)
        assert vec.equals(et)
        # element→page provenance matches the scalar per-page loop
        assert (np.bincount(page_idx, minlength=len(payloads)) == counts).all()

    def test_entities_and_edge_shapes(self):
        payload = (
            '<osm version="0.6">'
            '<node id="1" lat="0.5" lon="-1.5"/>'
            '<node id="2" lat="0" lon="0" version="3" user="a &amp; b">'
            '<tag k="name" v="A &gt; B &lt; C &quot;q&quot; &apos;a&apos; &amp;lt;"/></node>'
            '<way id="3" user="u &amp; v"><nd ref="1"/><nd ref="2"/>'
            '<tag k="x" v="1,2&amp;3"/></way>'
            '<relation id="4" timestamp="123"><member type="way" ref="3" role=""/>'
            '<member type="node" ref="1" role="stop &amp; go"/></relation>'
            "</osm>"
        )
        vec, _ = _vec_table([payload, "", payload])
        et, _ = _et_table([payload, "", payload])
        assert vec.equals(et)
        assert vec["tags"][1].as_py() == [("name", 'A > B < C "q" \'a\' &lt;')]

    def test_empty_and_whitespace_payloads(self):
        vec, idx = _vec_table(["", "   ", "\n"])
        assert vec.num_rows == 0 and len(idx) == 0

    def test_attribute_order_fallback_not_contract_error(self):
        # attributes out of the synthesizer's fixed order → the anchored
        # combined pass misses, the per-attribute fallback still parses
        payload = (
            '<osm version="0.6">'
            '<node lat="1.5" lon="2.5" id="7"/>'
            '<way id="8"><nd ref="7"/><tag v="b" k="a"/></way>'
            '<relation id="9"><member ref="8" type="way" role="r"/></relation>'
            "</osm>"
        )
        vec, _ = _vec_table([payload])
        et, _ = _et_table([payload])
        assert vec.equals(et)

    def test_unknown_entity_rejected(self):
        payload = '<osm><node id="1" lat="0" lon="0"><tag k="a" v="&#39;x"/></node></osm>'
        with pytest.raises(VecContractError):
            _vec_table([payload])

    def test_comment_rejected(self):
        payload = '<osm><!-- c --><node id="1" lat="0" lon="0"/></osm>'
        with pytest.raises(VecContractError):
            _vec_table([payload])

    def test_single_quoted_attr_rejected(self):
        payload = "<osm><node id='1' lat='0' lon='0'/></osm>"
        with pytest.raises(VecContractError):
            _vec_table([payload])

    def test_text_content_rejected(self):
        payload = '<osm><node id="1" lat="0" lon="0">hello</node></osm>'
        with pytest.raises(VecContractError):
            _vec_table([payload])

    def test_truncated_tag_rejected(self):
        payload = '<osm><node id="1" lat="0" lon="0"'
        with pytest.raises(VecContractError):
            _vec_table([payload])

    def test_unknown_tag_rejected(self):
        payload = '<osm><bounds minlat="0"/><node id="1" lat="0" lon="0"/></osm>'
        with pytest.raises(VecContractError):
            _vec_table([payload])

    def test_sibling_tag_after_self_closed_element_rejected(self):
        # ADVICE r3 #3: without closer tracking, the <tag> sibling was
        # attributed to the self-closed node (vec: [('a','b')], ET: []).
        payload = '<osm><node id="1" lat="0" lon="0"/><tag k="a" v="b"/></osm>'
        with pytest.raises(VecContractError):
            _vec_table([payload])

    def test_sibling_tag_after_closed_element_rejected(self):
        payload = (
            '<osm><node id="1" lat="0" lon="0"><tag k="x" v="y"/></node>'
            '<tag k="a" v="b"/></osm>'
        )
        with pytest.raises(VecContractError):
            _vec_table([payload])

    def test_unclosed_element_at_payload_end_rejected(self):
        payload = '<osm><way id="1"><nd ref="2"/></osm>'
        with pytest.raises(VecContractError):
            _vec_table([payload])

    def test_mismatched_closer_rejected(self):
        payload = '<osm><way id="1"><nd ref="2"/></node></osm>'
        with pytest.raises(VecContractError):
            _vec_table([payload])

    def test_nested_element_rejected(self):
        payload = (
            '<osm><way id="1"><node id="2" lat="0" lon="0"/>'
            '<nd ref="2"/></way></osm>'
        )
        with pytest.raises(VecContractError):
            _vec_table([payload])

    def test_closer_without_open_rejected(self):
        payload = '<osm><node id="1" lat="0" lon="0"/></node></osm>'
        with pytest.raises(VecContractError):
            _vec_table([payload])

    def test_explicit_close_pair_still_parses(self):
        # <tag k v></tag>-style children and <way ...></way> immediately
        # after a closed sibling stay INSIDE the contract
        payload = (
            '<osm><node id="1" lat="0" lon="0"><tag k="a" v="b"/></node>'
            '<way id="2"><nd ref="1"/></way></osm>'
        )
        vec, _ = _vec_table([payload])
        et, _ = _et_table([payload])
        assert vec.equals(et)


class TestVecExtractor:
    def test_extractor_vec_equals_et_with_url_and_validate(self):
        t = synthesize_pages_table(replicas=2)
        vec = OsmPayloadExtractor(include_url=True, validate=True, parser="vec")(t)
        et = OsmPayloadExtractor(include_url=True, validate=True, parser="et")(t)
        assert vec.equals(et)

    def test_extract_payloads_matches_text_column(self):
        import pyarrow.compute as pc

        t = synthesize_pages_table(replicas=1)
        payloads = extract_payloads(t["html"])
        assert pc.all(pc.equal(payloads, t["text"].combine_chunks())).as_py()

    def test_contract_violation_falls_back_to_scalar(self):
        # a page whose payload has a comment: vec path refuses, the
        # extractor must transparently produce the ET result
        payload = '<osm><!-- x --><node id="5" lat="1" lon="2"/></osm>'
        html = (
            b'<html><script type="application/osm+xml" id="osm-payload">'
            + payload.encode() + b"</script></html>"
        )
        batch = pa.table(
            {
                "url": ["u1"],
                "html": pa.array([html], pa.binary()),
                "text": [payload],
            }
        )
        out = OsmPayloadExtractor(include_url=True, validate=True, parser="vec")(batch)
        assert out.num_rows == 1
        assert out["id"][0].as_py() == 5
        assert out["url"][0].as_py() == "u1"

    def test_invariant_violation_raises(self):
        html = (
            b'<html><script type="application/osm+xml" id="osm-payload">'
            b"<osm></osm></script></html>"
        )
        batch = pa.table(
            {
                "url": ["u1"],
                "html": pa.array([html], pa.binary()),
                "text": ["<osm><node/></osm>"],  # differs from embedded payload
            }
        )
        with pytest.raises(ValueError):
            OsmPayloadExtractor(validate=True, parser="vec")(batch)

    def test_invariant_violation_skip_counts(self):
        html_ok_payload = '<osm><node id="1" lat="0" lon="0"/></osm>'
        html_ok = (
            b'<html><script type="application/osm+xml" id="osm-payload">'
            + html_ok_payload.encode() + b"</script></html>"
        )
        batch = pa.table(
            {
                "url": ["good", "bad"],
                "html": pa.array([html_ok, html_ok], pa.binary()),
                "text": [html_ok_payload, "mismatch"],
            }
        )
        ex = OsmPayloadExtractor(validate=True, parser="vec", on_error="skip")
        out = ex(batch)
        assert out.num_rows == 1
        assert ex.n_skipped == 1
