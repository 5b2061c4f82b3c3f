"""Minimal OSM PBF decoder (public format: https://wiki.openstreetmap.org/wiki/PBF_Format).

Hand-rolled protobuf wire-format reader — no external protobuf dependency.
Used ONCE at build time to turn the reference's golden fixture
(`/root/reference/tests/test.pbf`, provenance documented in the reference
README: relations 85965 + 2030162 cut from ecuador-latest.osm.pbf) into a
JSON element fixture (`osmptparser_ray/fixtures/osm_fixture.json`) that our
test suite and page synthesizer consume. This is a data-extraction tool, not
engine code.

Usage: python tools/decode_pbf.py <in.pbf> <out.json>
"""

from __future__ import annotations

import json
import struct
import sys
import zlib


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:  # pragma: no cover
            raise ValueError(f"wire type {wt}")
        yield field, wt, v


def _packed_varints(buf: bytes) -> list[int]:
    out = []
    i = 0
    while i < len(buf):
        v, i = _varint(buf, i)
        out.append(v)
    return out


def _packed_svarints(buf: bytes) -> list[int]:
    return [_zigzag(v) for v in _packed_varints(buf)]


def _delta_decode(vals: list[int]) -> list[int]:
    out = []
    acc = 0
    for v in vals:
        acc += v
        out.append(acc)
    return out


def _decode_info(buf: bytes, strings: list[str], date_granularity: int) -> dict:
    info: dict = {}
    for field, _wt, v in _fields(buf):
        if field == 1:
            info["version"] = str(v)
        elif field == 2:
            info["timestamp"] = str(v * date_granularity // 1000)
        elif field == 3:
            info["changeset"] = str(v)
        elif field == 4:
            info["uid"] = str(v)
        elif field == 5:
            info["user"] = strings[v]
        elif field == 6:
            info["visible"] = "true" if v else "false"
    return info


def _decode_primitive_block(buf: bytes) -> dict:
    strings: list[str] = []
    groups: list[bytes] = []
    granularity = 100
    lat_offset = 0
    lon_offset = 0
    date_granularity = 1000
    for field, _wt, v in _fields(buf):
        if field == 1:
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    strings.append(v2.decode("utf-8"))
        elif field == 2:
            groups.append(v)
        elif field == 17:
            granularity = v
        elif field == 18:
            date_granularity = v
        elif field == 19:
            lat_offset = v
        elif field == 20:
            lon_offset = v

    nodes: list[dict] = []
    ways: list[dict] = []
    relations: list[dict] = []

    def coord(off: int, gran: int, raw: int) -> float:
        return 1e-9 * (off + gran * raw)

    for g in groups:
        for field, _wt, v in _fields(g):
            if field == 1:  # plain Node
                nd: dict = {"tags": {}, "info": {}}
                keys: list[int] = []
                vals: list[int] = []
                for f2, w2, v2 in _fields(v):
                    if f2 == 1:
                        nd["id"] = _zigzag(v2) if w2 == 0 else v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 4:
                        nd["info"] = _decode_info(v2, strings, date_granularity)
                    elif f2 == 8:
                        nd["lat"] = coord(lat_offset, granularity, _zigzag(v2))
                    elif f2 == 9:
                        nd["lon"] = coord(lon_offset, granularity, _zigzag(v2))
                nd["tags"] = {strings[k]: strings[w] for k, w in zip(keys, vals)}
                nodes.append(nd)
            elif field == 2:  # DenseNodes
                ids: list[int] = []
                lats: list[int] = []
                lons: list[int] = []
                keys_vals: list[int] = []
                dense_info: dict[str, list[int]] = {}
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        ids = _delta_decode(_packed_svarints(v2))
                    elif f2 == 5:
                        for f3, _w3, v3 in _fields(v2):
                            if f3 == 1:
                                dense_info["version"] = _packed_varints(v3)
                            elif f3 == 2:
                                dense_info["timestamp"] = _delta_decode(_packed_svarints(v3))
                            elif f3 == 3:
                                dense_info["changeset"] = _delta_decode(_packed_svarints(v3))
                            elif f3 == 4:
                                dense_info["uid"] = _delta_decode(_packed_svarints(v3))
                            elif f3 == 5:
                                dense_info["user_sid"] = _delta_decode(_packed_svarints(v3))
                            elif f3 == 6:
                                dense_info["visible"] = _packed_varints(v3)
                    elif f2 == 8:
                        lats = _delta_decode(_packed_svarints(v2))
                    elif f2 == 9:
                        lons = _delta_decode(_packed_svarints(v2))
                    elif f2 == 10:
                        keys_vals = _packed_varints(v2)
                kv_i = 0
                for idx, nid in enumerate(ids):
                    tags = {}
                    while kv_i < len(keys_vals) and keys_vals[kv_i] != 0:
                        k = strings[keys_vals[kv_i]]
                        w = strings[keys_vals[kv_i + 1]]
                        tags[k] = w
                        kv_i += 2
                    kv_i += 1  # skip 0 delimiter
                    info = {}
                    if dense_info:
                        if "version" in dense_info:
                            info["version"] = str(dense_info["version"][idx])
                        if "timestamp" in dense_info:
                            info["timestamp"] = str(
                                dense_info["timestamp"][idx] * date_granularity // 1000
                            )
                        if "changeset" in dense_info:
                            info["changeset"] = str(dense_info["changeset"][idx])
                        if "uid" in dense_info:
                            info["uid"] = str(dense_info["uid"][idx])
                        if "user_sid" in dense_info:
                            info["user"] = strings[dense_info["user_sid"][idx]]
                        if "visible" in dense_info:
                            info["visible"] = "true" if dense_info["visible"][idx] else "false"
                    nodes.append(
                        {
                            "id": nid,
                            "lat": coord(lat_offset, granularity, lats[idx]),
                            "lon": coord(lon_offset, granularity, lons[idx]),
                            "tags": tags,
                            "info": info,
                        }
                    )
            elif field == 3:  # Way
                wd: dict = {"tags": {}, "info": {}, "node_refs": []}
                keys = []
                vals = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        wd["id"] = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 4:
                        wd["info"] = _decode_info(v2, strings, date_granularity)
                    elif f2 == 8:
                        wd["node_refs"] = _delta_decode(_packed_svarints(v2))
                wd["tags"] = {strings[k]: strings[w] for k, w in zip(keys, vals)}
                ways.append(wd)
            elif field == 4:  # Relation
                rd: dict = {"tags": {}, "info": {}, "members": []}
                keys = []
                vals = []
                roles: list[int] = []
                memids: list[int] = []
                types: list[int] = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        rd["id"] = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 4:
                        rd["info"] = _decode_info(v2, strings, date_granularity)
                    elif f2 == 8:
                        roles = _packed_varints(v2)
                    elif f2 == 9:
                        memids = _delta_decode(_packed_svarints(v2))
                    elif f2 == 10:
                        types = _packed_varints(v2)
                rd["tags"] = {strings[k]: strings[w] for k, w in zip(keys, vals)}
                rd["members"] = [
                    {"role": strings[r], "ref": m, "mtype": t}
                    for r, m, t in zip(roles, memids, types)
                ]
                relations.append(rd)
    return {"nodes": nodes, "ways": ways, "relations": relations}


def decode_pbf(path: str) -> dict:
    out = {"nodes": [], "ways": [], "relations": []}
    with open(path, "rb") as f:
        data = f.read()
    i = 0
    while i < len(data):
        (hdr_len,) = struct.unpack_from(">i", data, i)
        i += 4
        header = data[i : i + hdr_len]
        i += hdr_len
        btype = b""
        datasize = 0
        for field, _wt, v in _fields(header):
            if field == 1:
                btype = v
            elif field == 3:
                datasize = v
        blob = data[i : i + datasize]
        i += datasize
        raw = b""
        for field, _wt, v in _fields(blob):
            if field == 1:
                raw = v
            elif field == 3:
                raw = zlib.decompress(v)
        if btype == b"OSMData":
            block = _decode_primitive_block(raw)
            out["nodes"].extend(block["nodes"])
            out["ways"].extend(block["ways"])
            out["relations"].extend(block["relations"])
    return out


if __name__ == "__main__":
    result = decode_pbf(sys.argv[1])
    with open(sys.argv[2], "w") as f:
        json.dump(result, f, ensure_ascii=False, indent=None, separators=(",", ":"))
    print(
        f"nodes={len(result['nodes'])} ways={len(result['ways'])} "
        f"relations={len(result['relations'])}"
    )
