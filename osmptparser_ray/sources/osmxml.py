"""OSM XML payload parsing → columnar element batches.

The graft input embeds OSM elements in web pages as OSM XML fragments
(public format: <osm><node/><way/><relation/></osm>). This module parses a
payload string into columnar lists matching the unified element schema.

Metadata attributes (version, timestamp, changeset, uid, user, visible) are
carried as stringified values into the ``info`` map — same keys the
reference extracts from PBF Info records (reference mod.rs:204-230; our
synthetic XML carries epoch-second timestamps directly so extracted info is
byte-identical to the fixture's).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterable

import pyarrow as pa

INFO_KEYS = ("version", "timestamp", "changeset", "uid", "user", "visible")

# unified element schema: one row per OSM element, kind-dependent nullables
ELEMENT_SCHEMA = pa.schema(
    [
        pa.field("kind", pa.string()),  # 'node' | 'way' | 'relation'
        pa.field("id", pa.int64()),
        pa.field("lat", pa.float64()),
        pa.field("lon", pa.float64()),
        pa.field("tags", pa.map_(pa.string(), pa.string())),
        pa.field("info", pa.map_(pa.string(), pa.string())),
        pa.field("node_refs", pa.list_(pa.int64())),
        pa.field("member_roles", pa.list_(pa.string())),
        pa.field("member_refs", pa.list_(pa.int64())),
        pa.field("member_types", pa.list_(pa.int8())),  # 0=node 1=way 2=relation
    ]
)

MTYPE = {"node": 0, "way": 1, "relation": 2}


def _info_of(el: ET.Element) -> list[tuple[str, str]]:
    return [(k, el.attrib[k]) for k in INFO_KEYS if k in el.attrib]


def _tags_of(el: ET.Element) -> list[tuple[str, str]]:
    return [(t.attrib["k"], t.attrib["v"]) for t in el if t.tag == "tag"]


def parse_osm_payload(payload: str, out: dict[str, list]) -> int:
    """Parse one OSM XML payload, appending element rows to ``out`` columns.

    ``out`` must have one list per ELEMENT_SCHEMA column. Returns the number
    of elements appended. Empty/whitespace payloads contribute nothing.
    """
    if not payload or not payload.strip():
        return 0
    root = ET.fromstring(payload)
    n = 0
    for el in root:
        kind = el.tag
        if kind not in MTYPE:
            continue
        out["kind"].append(kind)
        out["id"].append(int(el.attrib["id"]))
        out["tags"].append(_tags_of(el))
        # nodes carry NO info — the reference's NodeData has no info field
        # (mod.rs:21-26); dropping it halves the node rows' byte volume
        out["info"].append([] if kind == "node" else _info_of(el))
        if kind == "node":
            out["lat"].append(float(el.attrib["lat"]))
            out["lon"].append(float(el.attrib["lon"]))
            out["node_refs"].append(None)
            out["member_roles"].append(None)
            out["member_refs"].append(None)
            out["member_types"].append(None)
        elif kind == "way":
            out["lat"].append(None)
            out["lon"].append(None)
            out["node_refs"].append(
                [int(nd.attrib["ref"]) for nd in el if nd.tag == "nd"]
            )
            out["member_roles"].append(None)
            out["member_refs"].append(None)
            out["member_types"].append(None)
        else:  # relation
            members = [m for m in el if m.tag == "member"]
            out["lat"].append(None)
            out["lon"].append(None)
            out["node_refs"].append(None)
            out["member_roles"].append([m.attrib.get("role", "") for m in members])
            out["member_refs"].append([int(m.attrib["ref"]) for m in members])
            out["member_types"].append([MTYPE[m.attrib["type"]] for m in members])
        n += 1
    return n


def empty_columns() -> dict[str, list]:
    return {name: [] for name in ELEMENT_SCHEMA.names}


def columns_to_table(out: dict[str, list]) -> pa.Table:
    return pa.table(
        {name: pa.array(out[name], type=ELEMENT_SCHEMA.field(name).type) for name in ELEMENT_SCHEMA.names}
    )


def elements_to_xml(
    nodes: Iterable[dict] = (),
    ways: Iterable[dict] = (),
    relations: Iterable[dict] = (),
) -> str:
    """Serialize element dicts (fixture format) back to an OSM XML payload.

    Deterministic output (attribute order fixed) — the synthesizer uses this
    so that extractor(html) == text byte-identically.
    """
    MTYPE_NAME = {0: "node", 1: "way", 2: "relation"}

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
            .replace('"', "&quot;")
        )

    parts = ['<osm version="0.6" generator="osmptparser_ray-synth">']
    for n in nodes:
        attrs = f'id="{n["id"]}" lat="{n["lat"]!r}" lon="{n["lon"]!r}"'
        for k in INFO_KEYS:
            if k in n.get("info", {}):
                attrs += f' {k}="{esc(n["info"][k])}"'
        tags = n.get("tags", {})
        if tags:
            parts.append(f"<node {attrs}>")
            for k, v in tags.items():
                parts.append(f'<tag k="{esc(k)}" v="{esc(v)}"/>')
            parts.append("</node>")
        else:
            parts.append(f"<node {attrs}/>")
    for w in ways:
        attrs = f'id="{w["id"]}"'
        for k in INFO_KEYS:
            if k in w.get("info", {}):
                attrs += f' {k}="{esc(w["info"][k])}"'
        parts.append(f"<way {attrs}>")
        for ref in w.get("node_refs", []):
            parts.append(f'<nd ref="{ref}"/>')
        for k, v in w.get("tags", {}).items():
            parts.append(f'<tag k="{esc(k)}" v="{esc(v)}"/>')
        parts.append("</way>")
    for r in relations:
        attrs = f'id="{r["id"]}"'
        for k in INFO_KEYS:
            if k in r.get("info", {}):
                attrs += f' {k}="{esc(r["info"][k])}"'
        parts.append(f"<relation {attrs}>")
        for m in r.get("members", []):
            parts.append(
                f'<member type="{MTYPE_NAME[m["mtype"]]}" ref="{m["ref"]}" role="{esc(m["role"])}"/>'
            )
        for k, v in r.get("tags", {}).items():
            parts.append(f'<tag k="{esc(k)}" v="{esc(v)}"/>')
        parts.append("</relation>")
    parts.append("</osm>")
    return "\n".join(parts)


# ---------------------------------------------------------------------------
# fast path: regex-based payload parser (differential-tested against ET)
# ---------------------------------------------------------------------------

import re as _re
from xml.sax.saxutils import unescape as _unescape

# our synthesizer (elements_to_xml) emits attributes double-quoted with the
# five standard XML entities only — exactly what _unescape reverses
_ELEM_RE = _re.compile(
    r"<(node|way|relation)\b([^>]*?)(/>|>(.*?)</\1>)", _re.DOTALL
)
_ATTR_RE = _re.compile(r'([A-Za-z_][\w:]*)="([^"]*)"')
_CHILD_RE = _re.compile(r'<(tag|nd|member)\b([^>]*?)/>')


_EXTRA_ENTITIES = {"&quot;": '"', "&apos;": "'"}  # saxutils covers only amp/lt/gt


def _attrs(s: str) -> dict:
    return {k: _unescape(v, _EXTRA_ENTITIES) for k, v in _ATTR_RE.findall(s)}


def parse_osm_payload_fast(payload: str, out: dict[str, list]) -> int:
    """Regex-based OSM XML payload parser (flat elements, attribute-only
    children, double-quoted attributes, standard entities).

    NOTE measured SLOWER than the C-accelerated ET parser on this corpus
    (~2x) — its value is as a differential cross-check of extraction
    (byte-exact against ``parse_osm_payload``, tests/test_fast_parser.py),
    not as a fast path. Falls outside its contract (CDATA, comments,
    single quotes, nested markup) → use the ET parser.
    """
    if not payload or not payload.strip():
        return 0
    n = 0
    for m in _ELEM_RE.finditer(payload):
        kind = m.group(1)
        head = _attrs(m.group(2))
        body = m.group(4) or ""
        tags: list = []
        refs: list = []
        members_r: list = []
        members_ref: list = []
        members_t: list = []
        for cm in _CHILD_RE.finditer(body):
            ck = cm.group(1)
            ca = _attrs(cm.group(2))
            if ck == "tag":
                tags.append((ca["k"], ca["v"]))
            elif ck == "nd":
                refs.append(int(ca["ref"]))
            else:
                members_r.append(ca.get("role", ""))
                members_ref.append(int(ca["ref"]))
                members_t.append(MTYPE[ca["type"]])
        out["kind"].append(kind)
        out["id"].append(int(head["id"]))
        out["tags"].append(tags)
        out["info"].append(
            [] if kind == "node" else [(k, head[k]) for k in INFO_KEYS if k in head]
        )
        if kind == "node":
            out["lat"].append(float(head["lat"]))
            out["lon"].append(float(head["lon"]))
            out["node_refs"].append(None)
            out["member_roles"].append(None)
            out["member_refs"].append(None)
            out["member_types"].append(None)
        elif kind == "way":
            out["lat"].append(None)
            out["lon"].append(None)
            out["node_refs"].append(refs)
            out["member_roles"].append(None)
            out["member_refs"].append(None)
            out["member_types"].append(None)
        else:
            out["lat"].append(None)
            out["lon"].append(None)
            out["node_refs"].append(None)
            out["member_roles"].append(members_r)
            out["member_refs"].append(members_ref)
            out["member_types"].append(members_t)
        n += 1
    return n
