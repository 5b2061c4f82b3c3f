"""Vectorized batch-level OSM XML payload parser (round-3 fast path).

Replaces the per-payload ``ET.fromstring`` + Python list building of
``osmxml.parse_osm_payload`` (the measured flagship wall-clock floor:
~74% of extraction CPU) with Arrow/RE2/numpy kernels whose Python cost
is O(piece classes), not O(elements):

1. pull every page's payload out of ``html`` with per-page ``bytes.find``
   (memmem — measured 3× faster than both Python ``re`` and a vectorized
   ``pc.extract_regex`` whose lazy ``(?s).*?`` capture forces RE2 into
   NFA submatch tracking over the whole page),
2. split the payload column on ``"<"`` (``pc.split_pattern``) so every
   XML tag is exactly one string "piece"; the list offsets remember
   which page each piece came from,
3. classify all pieces with ONE cheap anchored-prefix RE2 extract
   (``^(/?)(name)`` — measured 10× cheaper than a whole-piece capture)
   plus two captureless DFA scans for shape violations,
4. per piece-class, extract attributes with ONE anchored fixed-order
   RE2 pass (the layout ``elements_to_xml`` emits); any miss falls back
   to per-attribute order-agnostic ``\\b`` passes,
5. assemble the list/map columns of ELEMENT_SCHEMA from numpy
   ``cumsum``/``bincount`` offset math over the classification masks.

Contract (checked, not assumed): flat attribute-only XML with
double-quoted attributes and only the five standard entities — what
``osmxml.elements_to_xml`` emits (same dialect contract as
``parse_osm_payload_fast``, which remains the scalar differential
check). Any batch violating the contract raises ``VecContractError``
and the caller falls back to the per-payload ET parser for that batch —
correctness never depends on the fast path (differential gate:
tests/test_vecparse.py).

Equivalent of the reference's blob-decode stage (mod.rs:199-201) —
the "decode bytes → typed element columns" hot loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .osmxml import ELEMENT_SCHEMA, INFO_KEYS

__all__ = ["VecContractError", "extract_payloads", "parse_payload_batch"]


class VecContractError(ValueError):
    """Batch falls outside the vectorized parser's dialect contract."""


_START = b'<script type="application/osm+xml" id="osm-payload">'
_END = b"</script>"

# constructs the piece model cannot represent (one combined RE2 scan):
# processing instructions / comments / CDATA / single-quoted attributes
_UNSAFE_RE = r"<!--|<!\[|<\?|='"

_ENTITIES = ("&amp;", "&lt;", "&gt;", "&quot;", "&apos;")
_ENTITY_CHARS = ("&", "<", ">", '"', "'")

_NAMES = ("node", "way", "relation", "tag", "nd", "member", "osm")


def extract_payloads(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """html binary column → payload string column ("" when the page has no
    embedded payload). Per-PAGE loop (64/batch), not per-element: memmem
    ``bytes.find`` beats every vectorized formulation measured."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    out: list[bytes] = []
    for h in html.to_pylist():
        i = h.find(_START)
        if i < 0:
            out.append(b"")
            continue
        j = h.find(_END, i)
        out.append(h[i + len(_START) : j] if j >= 0 else b"")
    return pa.array(out, pa.binary()).cast(pa.string())  # validates utf-8


def _as_arr(a) -> pa.Array:
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def _unescape_checked(arr: pa.Array) -> pa.Array:
    """Reverse the five standard XML entities on an extracted-value array.

    Entity sanity is enforced HERE, on the (small) value arrays rather
    than the whole payload: every '&' must open one of the five standard
    entities, else the batch leaves the contract (numeric refs &#39; etc.
    need the ET parser). Replacement order puts &amp; LAST so
    '&amp;lt;' → '&lt;' — matches saxutils.unescape.
    """
    n_amp = pc.sum(pc.count_substring(arr, "&")).as_py() or 0
    if not n_amp:
        return arr
    n_ent = sum(pc.sum(pc.count_substring(arr, e)).as_py() or 0 for e in _ENTITIES)
    if n_ent != n_amp:
        raise VecContractError("non-standard entity in attribute value")
    for ent, ch in zip(
        _ENTITIES[1:] + _ENTITIES[:1], _ENTITY_CHARS[1:] + _ENTITY_CHARS[:1]
    ):
        arr = pc.replace_substring(arr, ent, ch)
    return arr


def _attr(pieces: pa.Array, name: str, required: bool = False) -> pa.Array:
    """Order/whitespace-agnostic single-attribute extraction (the fallback
    path; one RE2 NFA pass per attribute)."""
    got = pc.struct_field(pc.extract_regex(pieces, rf'\b{name}="(?P<v>[^"]*)"'), "v")
    if required and got.null_count:
        raise VecContractError(f"missing required attribute {name!r}")
    return got


def _attrs_anchored(
    pieces: pa.Array,
    tagname: str,
    names: tuple[str, ...],
    required: tuple[bool, ...],
) -> list[pa.Array]:
    """Extract several attributes in ONE anchored fixed-order RE2 pass
    (the emission order of ``elements_to_xml``); if any piece misses the
    fixed layout, fall back to per-attribute passes for the whole class."""
    if len(pieces) == 0:
        return [pa.array([], pa.string()) for _ in names]
    pat = rf"^{tagname} " + " ".join(rf'{n}="(?P<{n}>[^"]*)"' for n in names)
    hit = pc.extract_regex(pieces, pat)
    first = pc.struct_field(hit, names[0])
    if first.null_count == 0:
        return [pc.struct_field(hit, n) for n in names]
    return [_attr(pieces, n, req) for n, req in zip(names, required)]


def _list_offsets(counts: np.ndarray, valid: np.ndarray) -> pa.Array:
    """List offsets from per-element child counts, null where ``valid`` is
    False (offset[i] null → list entry i null; the final offset — a pure
    endpoint — must stay valid)."""
    offs = np.zeros(len(counts) + 1, dtype=np.int32)
    np.cumsum(counts, out=offs[1:])
    if valid.all():
        return pa.array(offs, pa.int32())
    mask = np.concatenate([~valid, [False]])
    return pa.array(offs, pa.int32(), mask=mask)


def parse_payload_batch(
    payloads: pa.Array | pa.ChunkedArray,
) -> tuple[pa.Table, np.ndarray]:
    """All payloads of a batch → (element table, element→page index).

    Elements come out in document order (page order, then in-page order) —
    identical to looping ``parse_osm_payload`` per page. Raises
    ``VecContractError`` when the batch falls outside the dialect contract.
    """
    payloads = pc.fill_null(_as_arr(payloads), "")
    if pc.any(pc.match_substring_regex(payloads, _UNSAFE_RE)).as_py():
        raise VecContractError("payload contains PI/comment/CDATA/single-quote")

    split = _as_arr(pc.split_pattern(payloads, "<"))
    pieces = split.flatten()
    piece_offs = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_pieces = len(pieces)
    page_of_piece = np.repeat(
        np.arange(len(payloads), dtype=np.int64), np.diff(piece_offs)
    )
    if n_pieces == 0:
        return ELEMENT_SCHEMA.empty_table(), np.empty(0, np.int64)

    # -- classify every piece (cheap anchored-prefix extract) --------------
    head = pc.extract_regex(pieces, r"^(?P<c>/?)(?P<n>[A-Za-z_][\w:]*)")
    names = pc.struct_field(head, "n")
    tagged = names.is_valid().to_numpy(zero_copy_only=False)
    if not tagged.all():
        # untagged pieces must be pure whitespace (the fragment before the
        # first '<' of each payload) — anything else leaves the contract
        blank = pc.match_substring_regex(pieces.filter(pa.array(~tagged)), r"^\s*$")
        if not pc.all(pc.fill_null(blank, False)).as_py():
            raise VecContractError("unparseable fragment between tags")
    name_code = (
        pc.fill_null(pc.index_in(names, pa.array(_NAMES)), -1)
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    if ((name_code < 0) & tagged).any():
        raise VecContractError("unknown tag name")
    # shape: every tagged piece is 'name attrs>whitespace'. Two captureless
    # DFA scans (10× cheaper than an anchored whole-piece capture): text
    # content / raw '>' in a value / multiple '>' → non-space after '>';
    # a truncated tag → no '>' at all.
    trailing = pc.match_substring_regex(pieces, r">\s*\S").to_numpy(
        zero_copy_only=False
    )
    if (trailing & tagged).any():
        raise VecContractError("tag piece with trailing content")
    has_gt = pc.match_substring(pieces, ">").to_numpy(zero_copy_only=False)
    if (tagged & ~has_gt).any():
        raise VecContractError("truncated tag piece")
    is_closer = pc.fill_null(
        pc.equal(pc.struct_field(head, "c"), "/"), False
    ).to_numpy(zero_copy_only=False)

    opener = tagged & ~is_closer
    is_elem = opener & (name_code >= 0) & (name_code <= 2)
    is_tag = opener & (name_code == 3)
    is_nd = opener & (name_code == 4)
    is_member = opener & (name_code == 5)

    n_elem = int(is_elem.sum())
    if n_elem == 0:
        if is_tag.any() or is_nd.any() or is_member.any():
            raise VecContractError("child tag outside any element")
        return ELEMENT_SCHEMA.empty_table(), np.empty(0, np.int64)

    elem_of_piece = np.cumsum(is_elem) - 1  # -1 before the first element
    child = is_tag | is_nd | is_member

    # -- closer tracking (ADVICE r3 #3) ------------------------------------
    # `elem_of_piece` attributes every child to the most recent element
    # OPENER; without closer accounting, a sibling <tag>/<nd>/<member>
    # following a self-closed or already-closed element would be silently
    # attributed to it (vec would differ from ET on well-formed input).
    # One extra captureless DFA scan + cheap cumsums keep the contract:
    # any piece sequence where the attributed opener is closed (or
    # self-closed) before its child leaves the fast path.
    self_closed = pc.match_substring_regex(pieces, r"/>\s*$").to_numpy(
        zero_copy_only=False
    )
    elem_open = is_elem & ~self_closed
    elem_close = is_closer & (name_code >= 0) & (name_code <= 2)
    open_cum = np.cumsum(elem_open)
    close_cum = np.cumsum(elem_close)
    # flat dialect: a new element may only open once every prior one closed
    open_before = (open_cum - elem_open) - (close_cum - elem_close)
    if (open_before[is_elem] != 0).any():
        raise VecContractError("element opened while another is still open")
    opener_pos = np.flatnonzero(is_elem)
    closer_pos = np.flatnonzero(elem_close)
    if len(closer_pos):
        if open_before[closer_pos].min() < 1 or elem_of_piece[closer_pos].min() < 0:
            raise VecContractError("element closer without open element")
        if (name_code[closer_pos] != name_code[opener_pos[elem_of_piece[closer_pos]]]).any():
            raise VecContractError("mismatched element closer")
    # every element opened in a payload must close in that payload
    if not np.array_equal(
        np.bincount(page_of_piece[elem_open], minlength=len(payloads)),
        np.bincount(page_of_piece[elem_close], minlength=len(payloads)),
    ):
        raise VecContractError("element left open at payload end")

    if child.any():
        if elem_of_piece[child].min() < 0:
            raise VecContractError("child tag before first element")
        child_pos = np.flatnonzero(child)
        child_opener = opener_pos[elem_of_piece[child]]
        if self_closed[child_opener].any():
            raise VecContractError("child tag after self-closed element")
        # close_cum is inclusive, but child/opener pieces are never closers
        if (close_cum[child_pos] != close_cum[child_opener]).any():
            raise VecContractError("child tag after its element was closed")
        # a child must belong to an element of the SAME page (an element
        # left open across a payload boundary is malformed)
        elem_pages = page_of_piece[is_elem]
        if not (page_of_piece[child] == elem_pages[elem_of_piece[child]]).all():
            raise VecContractError("child tag crosses a payload boundary")

    elem_kind_code = name_code[is_elem]  # 0=node 1=way 2=relation
    is_node = elem_kind_code == 0
    is_way = elem_kind_code == 1
    is_rel = elem_kind_code == 2

    # -- per-element scalar attributes -------------------------------------
    # nodes (the bulk): id/lat/lon in one anchored fixed-order pass
    node_pieces = pieces.filter(pa.array(is_elem & (name_code == 0)))
    nid, nlat, nlon = _attrs_anchored(
        node_pieces, "node", ("id", "lat", "lon"), (True, True, True)
    )
    if nid.null_count or nlat.null_count or nlon.null_count:
        raise VecContractError("node missing id/lat/lon")
    # ways + relations (few): id + the 6 optional info attributes — nodes
    # carry NO info (mod.rs:21-26 parity) so info is never extracted from
    # the node bulk at all
    wr_mask = is_elem & (name_code >= 1)
    wr_pieces = pieces.filter(pa.array(wr_mask))
    wr_id = _attr(wr_pieces, "id", required=True)
    info_vals = [_attr(wr_pieces, k) for k in INFO_KEYS]

    # stitch node/way-relation scalars back into element order
    ids_np = np.empty(n_elem, np.int64)
    ids_np[is_node] = _as_arr(nid.cast(pa.int64())).to_numpy(zero_copy_only=False)
    ids_np[~is_node] = _as_arr(wr_id.cast(pa.int64())).to_numpy(zero_copy_only=False)
    ids = pa.array(ids_np, pa.int64())
    lat_np = np.full(n_elem, np.nan)
    lat_np[is_node] = _as_arr(nlat.cast(pa.float64())).to_numpy(zero_copy_only=False)
    lon_np = np.full(n_elem, np.nan)
    lon_np[is_node] = _as_arr(nlon.cast(pa.float64())).to_numpy(zero_copy_only=False)
    lat = pa.array(lat_np, pa.float64(), mask=~is_node)
    lon = pa.array(lon_np, pa.float64(), mask=~is_node)

    kind = pc.take(
        pa.array(["node", "way", "relation"]), pa.array(elem_kind_code, pa.int8())
    )

    # -- info map over way/relation elements (nodes: empty) ----------------
    n_wr = len(wr_pieces)
    present = np.stack(
        [v.is_valid().to_numpy(zero_copy_only=False) for v in info_vals], axis=1
    )  # (n_wr, 6)
    wr_pos = np.flatnonzero(~is_node)  # element index of each way/relation
    info_counts = np.zeros(n_elem, np.int64)
    info_counts[wr_pos] = present.sum(axis=1)
    flat = np.flatnonzero(present.ravel())  # wr-major, key order within
    key_idx = flat % len(INFO_KEYS)
    wr_idx = flat // len(INFO_KEYS)
    info_keys_arr = pc.take(pa.array(list(INFO_KEYS)), pa.array(key_idx, pa.int64()))
    combined_vals = pa.concat_arrays([_as_arr(v) for v in info_vals])
    info_vals_arr = pc.take(combined_vals, pa.array(key_idx * n_wr + wr_idx, pa.int64()))
    info_vals_arr = _unescape_checked(_as_arr(info_vals_arr))
    info_offs = np.zeros(n_elem + 1, np.int32)
    np.cumsum(info_counts, out=info_offs[1:])
    info_col = pa.MapArray.from_arrays(
        pa.array(info_offs, pa.int32()), _as_arr(info_keys_arr), info_vals_arr
    )

    # -- tags map ----------------------------------------------------------
    tag_pieces = pieces.filter(pa.array(is_tag))
    tag_elem = elem_of_piece[is_tag]
    tag_k, tag_v = _attrs_anchored(tag_pieces, "tag", ("k", "v"), (True, True))
    if tag_k.null_count or tag_v.null_count:
        raise VecContractError("tag missing k/v")
    tag_k = _unescape_checked(_as_arr(tag_k))
    tag_v = _unescape_checked(_as_arr(tag_v))
    tag_counts = np.bincount(tag_elem, minlength=n_elem)
    tag_offs = np.zeros(n_elem + 1, np.int32)
    np.cumsum(tag_counts, out=tag_offs[1:])
    tags_col = pa.MapArray.from_arrays(pa.array(tag_offs, pa.int32()), tag_k, tag_v)

    # -- node_refs (ways only) ---------------------------------------------
    nd_pieces = pieces.filter(pa.array(is_nd))
    nd_elem = elem_of_piece[is_nd]
    (nd_refs,) = _attrs_anchored(nd_pieces, "nd", ("ref",), (True,))
    if nd_refs.null_count:
        raise VecContractError("nd missing ref")
    nd_refs = nd_refs.cast(pa.int64())
    nd_counts = np.bincount(nd_elem, minlength=n_elem)
    if (nd_counts[~is_way] != 0).any():
        raise VecContractError("<nd> inside a non-way element")
    node_refs_col = pa.ListArray.from_arrays(
        _list_offsets(nd_counts, is_way), _as_arr(nd_refs)
    )

    # -- members (relations only) ------------------------------------------
    m_pieces = pieces.filter(pa.array(is_member))
    m_elem = elem_of_piece[is_member]
    m_type_s, m_ref, m_role = _attrs_anchored(
        m_pieces, "member", ("type", "ref", "role"), (True, True, False)
    )
    if m_type_s.null_count or m_ref.null_count:
        raise VecContractError("member missing type/ref")
    m_role = pc.fill_null(_unescape_checked(_as_arr(m_role)), "")
    m_ref = m_ref.cast(pa.int64())
    m_type = pc.index_in(m_type_s, pa.array(["node", "way", "relation"]))
    if m_type.null_count:
        raise VecContractError("member with unknown type")
    m_type = m_type.cast(pa.int8())
    m_counts = np.bincount(m_elem, minlength=n_elem)
    if (m_counts[~is_rel] != 0).any():
        raise VecContractError("<member> inside a non-relation element")
    roles_col = pa.ListArray.from_arrays(_list_offsets(m_counts, is_rel), _as_arr(m_role))
    mrefs_col = pa.ListArray.from_arrays(_list_offsets(m_counts, is_rel), _as_arr(m_ref))
    mtypes_col = pa.ListArray.from_arrays(_list_offsets(m_counts, is_rel), _as_arr(m_type))

    table = pa.table(
        {
            "kind": kind,
            "id": ids,
            "lat": lat,
            "lon": lon,
            "tags": tags_col,
            "info": info_col,
            "node_refs": node_refs_col,
            "member_roles": roles_col,
            "member_refs": mrefs_col,
            "member_types": mtypes_col,
        },
        schema=ELEMENT_SCHEMA,
    )
    return table, page_of_piece[is_elem]
