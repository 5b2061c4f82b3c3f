"""Engine-INDEPENDENT derivation of the `areas_fixture` golden.

Scalar, line-by-line Python transliteration of the reference algorithms
(reference src/parser/relation.rs:88-337 — pointdistance, the constant
``-1.0`` edgedistance fold, identity sort_ways, first_pass, join_ways
``<`` vs close_linestring ``<=`` tolerance asymmetry, flatten_ways
cascade, Way::flatten_ways) applied to the decoded fixture
(osm_fixture.json). Deliberately imports NOTHING from osmptparser_ray's
kernel — this is the oracle the engine is checked AGAINST, so it must not
share code with it. Node resolution mirrors get_way_from
(mod.rs:705-722): missing node refs silently filtered; ways with zero
refs dropped at scan time (mod.rs:380-388).

Usage:
    python tools/derive_goldens.py            # print VALUES literal
    python tools/derive_goldens.py --rows     # print one row per line

The printed VALUES literal is what `oracle_sql()['areas_fixture']`
carries; tests/test_areas_relations.py asserts the engine matches these
derived rows, making the driver golden engine-independent.
"""

from __future__ import annotations

import json
import math
import os
import sys

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "osmptparser_ray",
    "fixtures",
    "osm_fixture.json",
)

INF = float("inf")


# --- relation.rs:88-105 ----------------------------------------------------
# Node identity is by ID (PartialEq, relation.rs:26-31); a "node" here is a
# (id, lat, lon) tuple and comparisons use index 0 only.


def pointdistance(p1, p2):  # relation.rs:88-90 (planar degrees)
    return math.sqrt((p1[1] - p2[1]) ** 2 + (p1[2] - p2[2]) ** 2)


def edgedistance(w1, w2):  # relation.rs:92-105
    dists = [
        pointdistance(w1[0], w2[0]),
        pointdistance(w1[-1], w2[-1]),
        pointdistance(w1[0], w2[-1]),
        pointdistance(w1[-1], w2[0]),
    ]
    # literal fold: acc starts at -1.0 and "if a < b keep a else b" — since
    # every distance is >= 0 > -1, the fold ALWAYS returns -1.0 (the
    # reference bug we must reproduce)
    a = -1.0
    for b in dists:
        a = a if a < b else b
    return a


def _ids(way):
    return [n[0] for n in way]


def first_pass(ways):  # relation.rs:111-150
    n = len(ways)
    ordered = [list(ways[0])]
    for i in range(1, n):
        way = list(ways[i])
        prev = ordered[-1]
        if _ids(ordered[-1]) == _ids(ways[i - 1]) and (
            way[0][0] == prev[0][0] or way[-1][0] == prev[0][0]
        ):
            ordered[-1] = list(reversed(prev))
            prev = ordered[-1]
        if prev[-1][0] == way[0][0]:
            ordered[-1] = ordered[-1] + way[1:]
        elif prev[-1][0] == way[-1][0]:
            ordered[-1] = ordered[-1] + list(reversed(way))[1:]
        else:
            ordered.append(way)
    return ordered


def sort_ways(ways):  # relation.rs:158-177 (identity in practice: constant fold)
    ws = [list(w) for w in ways]
    out = [ws[0]]
    ws = ws[1:]
    while ws:
        mindist = INF
        minidx = 0
        for i in range(len(ws)):
            d = edgedistance(ws[i], out[-1])
            if d < mindist:
                mindist = d
                minidx = i
        out.append(ws[minidx])
        ws.pop(minidx)
    return out


def dist_haversine(p1, p2):  # relation.rs:180-196
    radius = 6_371_000.0
    dlat = math.radians(p2[1] - p1[1])
    dlon = math.radians(p2[2] - p1[2])
    a = (
        math.sin(dlat / 2) ** 2
        + math.cos(math.radians(p1[1]))
        * math.cos(math.radians(p2[1]))
        * math.sin(dlon / 2) ** 2
    )
    return radius * 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a))


def join_ways(ways, tolerance):  # relation.rs:203-227 (STRICT <)
    joined = [list(ways[0])]
    for w in [list(x) for x in ways[1:]]:
        last = joined[-1]
        if dist_haversine(last[-1], w[0]) < tolerance:
            joined[-1] = last + w
        elif dist_haversine(last[-1], w[-1]) < tolerance:
            joined[-1] = last + list(reversed(w))
        elif dist_haversine(last[0], w[0]) < tolerance:
            joined[-1] = list(reversed(last)) + w
        elif dist_haversine(last[0], w[-1]) < tolerance:
            joined[-1] = list(reversed(last)) + list(reversed(w))
        else:
            joined.append(w)
    return joined


def flatten_ways(ways, tolerance):  # relation.rs:229-254
    if not ways:
        return [], (501, "Broken")
    passed = first_pass(ways)
    if len(passed) == 1:
        return passed, (0, "")
    srt = sort_ways(passed)
    sorted_passed = first_pass(srt)
    if len(sorted_passed) == 1:
        return sorted_passed, (101, "Sorted")
    joined = join_ways(passed, tolerance)
    if len(joined) == 1:
        return joined, (102, "Joined")
    joined_sorted = join_ways(srt, tolerance)
    if len(joined_sorted) == 1:
        return joined_sorted, (103, "Joined Sorted")  # unreachable given 102
    return [], (501, "Broken")


def close_linestring(way, tolerance):  # relation.rs:258-270 (<= tolerance)
    if way[0][0] == way[-1][0]:
        return list(way), (0, "")
    if dist_haversine(way[0], way[-1]) <= tolerance:
        return list(way) + [way[0]], (102, "Joined")
    return [], (501, "Broken")


def way_flatten(nodes, tolerance, closed=True):  # relation.rs:310-337
    f_ways, f_status = flatten_ways([nodes], tolerance)
    if closed and f_status[0] != 501:
        out = []
        status = f_status
        for w in f_ways:
            w_closed, w_status = close_linestring(w, tolerance)
            if w_status[0] == 501:
                status = (501, "Broken")
            if w_status[0] != 501 and status[0] != 501:
                status = w_status
            out.append(w_closed)
        return out, status
    return f_ways, f_status


def derive_area_rows(gap: float = 150.0, tag_filter: str = "highway"):
    """→ sorted [(id, 'w', status_code, n_rings, n_points)] for standalone
    filter-matching fixture ways (the areas_fixture golden)."""
    fx = json.load(open(FIXTURE))
    nodes = {}  # last-wins (mod.rs:494)
    for n in fx["nodes"]:
        nodes[n["id"]] = (n["id"], n["lat"], n["lon"])
    rows = []
    for w in fx["ways"]:
        if tag_filter not in w["tags"]:
            continue
        if not w["node_refs"]:  # dropped at scan (mod.rs:380-388)
            continue
        resolved = [nodes[r] for r in w["node_refs"] if r in nodes]
        geom, status = way_flatten(resolved, gap, closed=True)
        n_rings = len(geom)
        n_points = sum(len(ring) for ring in geom)
        rows.append((w["id"], "w", status[0], n_rings, n_points))
    return sorted(rows)


def derive_pt_geometry(rel_id: int, gap: float = 1500.0):
    """Relation flatten via the scalar transliteration → list of segments
    (each a list of (id, lat, lon) nodes). Role-blind: every way member in
    member order (mod.rs:242-252); missing ways/nodes silently dropped."""
    fx = json.load(open(FIXTURE))
    nodes = {}
    for n in fx["nodes"]:
        nodes[n["id"]] = (n["id"], n["lat"], n["lon"])
    ways = {}
    for w in fx["ways"]:
        ways[w["id"]] = w  # last-wins
    rel = next(r for r in fx["relations"] if r["id"] == rel_id)
    seqs = []
    for m in rel["members"]:
        if m["mtype"] != 1 or m["ref"] not in ways:
            continue
        resolved = [nodes[r] for r in ways[m["ref"]]["node_refs"] if r in nodes]
        if resolved:
            seqs.append(resolved)
    return flatten_ways(seqs, gap)


# --- independent realization of the documented cell-id layout ---------------
# (spatial/cell.py module docstring is the spec: uint64 = morton(x, y) << 5
# | level, x = floor((lon+180)/360*2^L), y = floor((lat+90)/180*2^L);
# the bit interleave here is a per-bit loop, not the engine's magic-mask
# spread, so the two implementations are independent)


def _cell_id(x: int, y: int, level: int) -> int:
    m = 0
    for i in range(32):
        m |= ((x >> i) & 1) << (2 * i)
        m |= ((y >> i) & 1) << (2 * i + 1)
    return (m << 5) | level


def _cover(min_lon, min_lat, max_lon, max_lat, level):
    n = 1 << level

    def clamp(v):
        return max(0, min(n - 1, v))

    x0 = clamp(math.floor((min_lon + 180.0) / 360.0 * n))
    x1 = clamp(math.floor((max_lon + 180.0) / 360.0 * n))
    y0 = clamp(math.floor((min_lat + 90.0) / 180.0 * n))
    y1 = clamp(math.floor((max_lat + 90.0) / 180.0 * n))
    return {
        _cell_id(x, y, level)
        for x in range(x0, x1 + 1)
        for y in range(y0, y1 + 1)
    }


def derive_raster_vector_rows(level: int = 13):
    """The raster_vector golden, engine-free: route 2030162's flattened
    geometry (transliteration, gap 1500 open) → per-EDGE bbox cover at
    ``level`` (matching the operator's documented replication rule) ∩ the
    query's tile set cover_bbox(-80.1, -2.3, -79.8, -2.0). → sorted
    [(cell_hex, route_id)]."""
    segments, status = derive_pt_geometry(2030162, 1500.0)
    assert status[0] == 0, status
    cover: set = set()
    for seg in segments:
        for a, b in zip(seg, seg[1:]):
            lo0, lo1 = sorted((a[2], b[2]))
            la0, la1 = sorted((a[1], b[1]))
            cover |= _cover(lo0, la0, lo1, la1, level)
    tiles = _cover(-80.1, -2.3, -79.8, -2.0, level)
    hit = sorted(cover & tiles)
    return [(f"{c:016x}", 2030162) for c in hit]


def values_literal(rows) -> str:
    vals = ", ".join(f"({i}, '{t}', {s}, {r}, {p})" for i, t, s, r, p in rows)
    return (
        "SELECT CAST(id AS BIGINT) AS id, id_type, CAST(status_code AS BIGINT) "
        "AS status_code, CAST(n_rings AS BIGINT) AS n_rings, CAST(n_points AS "
        f"BIGINT) AS n_points FROM (VALUES {vals}) "
        "AS t(id, id_type, status_code, n_rings, n_points)"
    )


if __name__ == "__main__":
    rows = derive_area_rows()
    if "--rows" in sys.argv:
        for r in rows:
            print(r)
    else:
        print(values_literal(rows))
    print(f"-- areas_fixture: {len(rows)} rows", file=sys.stderr)
    rv = derive_raster_vector_rows()
    vals = ", ".join(f"('{h}', {rid})" for h, rid in rv)
    print(
        "SELECT cell_hex, CAST(route_id AS BIGINT) AS route_id FROM "
        f"(VALUES {vals}) AS t(cell_hex, route_id)"
    )
    print(f"-- raster_vector: {len(rv)} rows", file=sys.stderr)
