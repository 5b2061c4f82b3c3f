"""The way-flattening geometry kernel — pure Python/numpy, zero Ray.

Re-implements (from behavioral study, not translation of execution) the
reference's per-relation geometry pipeline:

* ``first_pass``      — reference src/parser/relation.rs:111-150
* ``sort_ways``       — relation.rs:158-177 (bug-compatible: identity, see below)
* ``edge_distance``   — relation.rs:92-105 (bug-compatible: constant -1.0)
* ``join_ways``       — relation.rs:203-227
* ``flatten_ways``    — relation.rs:229-254 (the status cascade)
* ``close_linestring``— relation.rs:258-270
* ``flatten_relation``/``flatten_single_way`` — relation.rs:277-337
* ``haversine_m``     — relation.rs:180-196

Bug-compatibility notes (load-bearing, verified against the reference
fixture, see tests/test_kernel.py):

1. ``edge_distance`` folds the four endpoint distances with seed ``-1.0``
   under min semantics (relation.rs:104) — distances are non-negative, so it
   ALWAYS returns -1.0.
2. Consequently ``sort_ways``'s strict ``<`` comparison (relation.rs:168)
   never moves ``minidx`` off 0 and the "sort" preserves input order exactly.
   We keep the literal algorithm (cheap) rather than hard-coding identity so
   that NaN coordinates propagate identically.
3. Because sort is identity, status 103 ("Joined Sorted") is unreachable
   (same input as the 102 branch) and status 101 means "first_pass applied
   twice merged everything".
4. A relation that cannot be flattened returns EMPTY geometry with status
   501, not partial segments (relation.rs:253).
5. Node equality is BY ID ONLY (relation.rs:26-31) — two nodes with equal
   coordinates but different ids never merge, and vice versa.

A node sequence ("way") is a ``NodeSeq`` of three aligned numpy arrays
(ids int64, lats float64, lons float64). All functions are pure.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import numpy as np

from .status import BROKEN, JOINED, JOINED_SORTED, OK, SORTED, ParseStatus

EARTH_RADIUS_M = 6_371_000.0


class NodeSeq(NamedTuple):
    """An ordered sequence of OSM nodes (one member way's nodes)."""

    ids: np.ndarray  # int64
    lats: np.ndarray  # float64
    lons: np.ndarray  # float64

    @classmethod
    def build(cls, ids, lats, lons) -> "NodeSeq":
        return cls(
            np.asarray(ids, dtype=np.int64),
            np.asarray(lats, dtype=np.float64),
            np.asarray(lons, dtype=np.float64),
        )

    def reverse(self) -> "NodeSeq":
        return NodeSeq(self.ids[::-1], self.lats[::-1], self.lons[::-1])

    def concat_tail(self, other: "NodeSeq") -> "NodeSeq":
        """Append other[1:] (dedup the shared endpoint), reference relation.rs:132-141."""
        return NodeSeq(
            np.concatenate([self.ids, other.ids[1:]]),
            np.concatenate([self.lats, other.lats[1:]]),
            np.concatenate([self.lons, other.lons[1:]]),
        )

    def concat_full(self, other: "NodeSeq") -> "NodeSeq":
        """Append ALL of other (no dedup), reference join_ways relation.rs:209-221."""
        return NodeSeq(
            np.concatenate([self.ids, other.ids]),
            np.concatenate([self.lats, other.lats]),
            np.concatenate([self.lons, other.lons]),
        )

    def __len__(self) -> int:
        return len(self.ids)

    def same_ids(self, other: "NodeSeq") -> bool:
        """Vec<Node> equality in the reference = elementwise id equality.

        Identity fast path: first_pass asks `ordered[-1].same_ids(
        ways[i-1])` every step, and after a plain append the two ARE the
        same object — the value compare only runs for concat/reverse
        results (whose lengths usually differ, short-circuiting)."""
        if self is other:
            return True
        return len(self.ids) == len(other.ids) and bool(np.array_equal(self.ids, other.ids))


def point_distance(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Euclidean distance in DEGREES (not meters) — reference relation.rs:88-90."""
    return math.sqrt((lat1 - lat2) ** 2 + (lon1 - lon2) ** 2)


def edge_distance(w1: NodeSeq, w2: NodeSeq) -> float:
    """Min of 4 endpoint distances folded from seed -1.0 (reference relation.rs:92-105).

    Since distances are >= 0 the fold keeps -1.0 — kept literal for
    bug-compatibility (incl. NaN propagation through the `a < b` compare).
    """
    d = [
        point_distance(w1.lats[0], w1.lons[0], w2.lats[0], w2.lons[0]),
        point_distance(w1.lats[-1], w1.lons[-1], w2.lats[-1], w2.lons[-1]),
        point_distance(w1.lats[0], w1.lons[0], w2.lats[-1], w2.lons[-1]),
        point_distance(w1.lats[-1], w1.lons[-1], w2.lats[0], w2.lons[0]),
    ]
    acc = -1.0
    for b in d:
        acc = acc if acc < b else b
    return acc


def haversine_m(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Haversine distance in meters, R=6,371,000 — reference relation.rs:180-196."""
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = (
        math.sin(dlat / 2.0) ** 2
        + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2)) * math.sin(dlon / 2.0) ** 2
    )
    return EARTH_RADIUS_M * 2.0 * math.atan2(math.sqrt(a), math.sqrt(1.0 - a))


def haversine_m_vec(lat1, lon1, lat2, lon2):
    """Vectorized haversine (numpy), same constants as ``haversine_m``."""
    lat1, lon1, lat2, lon2 = (np.asarray(x, dtype=np.float64) for x in (lat1, lon1, lat2, lon2))
    dlat = np.radians(lat2 - lat1)
    dlon = np.radians(lon2 - lon1)
    a = (
        np.sin(dlat / 2.0) ** 2
        + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2)) * np.sin(dlon / 2.0) ** 2
    )
    return EARTH_RADIUS_M * 2.0 * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a))


def first_pass(ways: Sequence[NodeSeq]) -> list[NodeSeq]:
    """Single sweep joining consecutive ways sharing endpoint node-ids.

    Reference relation.rs:111-150, incl. the reverse-the-head special case
    (relation.rs:120-127) guarded by `ordered_ways[last] == ways[i-1]`.
    """
    ordered: list[NodeSeq] = [ways[0]]
    for i in range(1, len(ways)):
        way = ways[i]
        prev = ordered[-1]
        # head-reversal: only if the accumulated last segment still IS the
        # previous input way (id-sequence equality) and this way touches its
        # FIRST node
        if ordered[-1].same_ids(ways[i - 1]) and (
            way.ids[0] == prev.ids[0] or way.ids[-1] == prev.ids[0]
        ):
            ordered[-1] = prev.reverse()
            prev = ordered[-1]
        if prev.ids[-1] == way.ids[0]:
            ordered[-1] = prev.concat_tail(way)
        elif prev.ids[-1] == way.ids[-1]:
            ordered[-1] = prev.concat_tail(way.reverse())
        else:
            ordered.append(way)
    return ordered


def sort_ways(ways: Sequence[NodeSeq]) -> list[NodeSeq]:
    """Greedy nearest-endpoint reorder — reference relation.rs:158-177.

    Effectively identity because ``edge_distance`` is constant -1.0 and the
    comparison is strict ``<`` (see module docstring).

    Fast path (round-3): the O(W²) edge_distance sweep was measured as
    ~20% of assembly CPU while provably selecting index 0 every time —
    the -1.0 fold deviates ONLY when an endpoint coordinate is NaN (the
    `acc < b` compare then propagates differently), so the literal loop
    is kept behind a vectorized endpoint-NaN guard and the identity is
    returned otherwise. Behavior-identical by case analysis AND by the
    byte-exact fixture goldens.
    """
    ws = list(ways)
    finite = True
    for w in ws:
        if not (
            math.isfinite(w.lats[0]) and math.isfinite(w.lons[0])
            and math.isfinite(w.lats[-1]) and math.isfinite(w.lons[-1])
        ):
            finite = False
            break
    if finite:
        return ws  # every edge_distance is exactly -1.0 ⇒ always pop(0)
    out = [ws.pop(0)]
    while ws:
        mindist = math.inf
        minidx = 0
        for i, w in enumerate(ws):
            dist = edge_distance(w, out[-1])
            if dist < mindist:
                mindist = dist
                minidx = i
        out.append(ws.pop(minidx))
    return out


def join_ways(ways: Sequence[NodeSeq], tolerance: float) -> list[NodeSeq]:
    """Gap-stitch segments whose endpoints are within ``tolerance`` meters.

    Reference relation.rs:203-227. Works against the ACCUMULATED last
    segment; may reverse it in place; keeps both junction endpoints (no
    dedup). Strict ``<`` tolerance comparisons.
    """
    joined: list[NodeSeq] = [ways[0]]
    for w in ways[1:]:
        last = joined[-1]
        if haversine_m(last.lats[-1], last.lons[-1], w.lats[0], w.lons[0]) < tolerance:
            joined[-1] = last.concat_full(w)
        elif haversine_m(last.lats[-1], last.lons[-1], w.lats[-1], w.lons[-1]) < tolerance:
            joined[-1] = last.concat_full(w.reverse())
        elif haversine_m(last.lats[0], last.lons[0], w.lats[0], w.lons[0]) < tolerance:
            joined[-1] = last.reverse().concat_full(w)
        elif haversine_m(last.lats[0], last.lons[0], w.lats[-1], w.lons[-1]) < tolerance:
            joined[-1] = last.reverse().concat_full(w.reverse())
        else:
            joined.append(w)
    return joined


def flatten_ways(
    ways: Sequence[NodeSeq], tolerance: float
) -> tuple[list[NodeSeq], ParseStatus]:
    """The status cascade — reference relation.rs:229-254.

    first_pass → (0) → first_pass(sort_ways(.)) → (101) → join_ways(passed)
    → (102) → join_ways(sorted) → (103, unreachable) → EMPTY + 501.
    """
    if len(ways) == 0:
        return [], ParseStatus.of(BROKEN)
    passed = first_pass(ways)
    if len(passed) == 1:
        return passed, ParseStatus.ok()
    srt = sort_ways(passed)
    sorted_passed = first_pass(srt)
    if len(sorted_passed) == 1:
        return sorted_passed, ParseStatus.of(SORTED)
    joined = join_ways(passed, tolerance)
    if len(joined) == 1:
        return joined, ParseStatus.of(JOINED)
    joined_sorted = join_ways(srt, tolerance)
    if len(joined_sorted) == 1:
        return joined_sorted, ParseStatus.of(JOINED_SORTED)
    return [], ParseStatus.of(BROKEN)


def close_linestring(way: NodeSeq, tolerance: float) -> tuple[NodeSeq, ParseStatus]:
    """Ring closing — reference relation.rs:258-270.

    Closed by id → OK; endpoints within tolerance (``<=`` here, unlike
    join_ways' ``<``) → append first point, 102; else EMPTY + 501.
    """
    if way.ids[0] == way.ids[-1]:
        return way, ParseStatus.ok()
    if haversine_m(way.lats[0], way.lons[0], way.lats[-1], way.lons[-1]) <= tolerance:
        closed = NodeSeq(
            np.concatenate([way.ids, way.ids[:1]]),
            np.concatenate([way.lats, way.lats[:1]]),
            np.concatenate([way.lons, way.lons[:1]]),
        )
        return closed, ParseStatus.of(JOINED)
    return NodeSeq.build([], [], []), ParseStatus.of(BROKEN)


def _close_all(
    segments: list[NodeSeq], status: ParseStatus, tolerance: float
) -> tuple[list[NodeSeq], ParseStatus]:
    """Closed-variant status merge — reference relation.rs:286-299.

    Any 501 ring ⇒ overall 501 (sticky); otherwise the LAST ring's status
    wins (a trailing OK ring overwrites an earlier 102 — literal reference
    behavior). Broken rings still contribute their (empty) geometry slot.
    """
    out: list[NodeSeq] = []
    merged = status
    for seg in segments:
        ring, ring_status = close_linestring(seg, tolerance)
        if ring_status.code == BROKEN:
            merged = ParseStatus.of(BROKEN)
        if ring_status.code != BROKEN and merged.code != BROKEN:
            merged = ring_status
        out.append(ring)
    return out, merged


def flatten_relation(
    ways: Sequence[NodeSeq], tolerance: float, closed: bool
) -> tuple[list[NodeSeq], ParseStatus]:
    """Relation::flatten_ways — reference relation.rs:277-303."""
    segments, status = flatten_ways(ways, tolerance)
    if closed and status.code != BROKEN:
        return _close_all(segments, status, tolerance)
    return segments, status


def flatten_single_way(
    way: NodeSeq, tolerance: float, closed: bool
) -> tuple[list[NodeSeq], ParseStatus]:
    """Way::flatten_ways (standalone way as a one-element list) — relation.rs:310-337."""
    return flatten_relation([way], tolerance, closed)
