"""Literal ``.osm.pbf`` binary source — the reference's native input format.

The reference reads a PBF through a sequential BlobReader and fans decoded
blobs out to worker threads (reference src/parser/mod.rs:273-281 blob scan,
mod.rs:199-201 decode). The Ray-Data-native shape of the same idea:

1. ``scan_pbf_blobs`` — ONE sequential driver-side pass over the file's
   length-prefixed framing that reads ONLY the 4-byte lengths + tiny
   BlobHeader messages and seeks over every payload: the result is a list
   of (offset, size) descriptors for the OSMData blobs. A planet-scale PBF
   (~70 GB) has ~40k blobs, so this index costs ~40k small reads and no
   payload I/O; the framing is inherently sequential, so this is the
   minimal serial section.
2. ``read_pbf_elements`` — the descriptors become a Dataset;
   ``map_batches`` tasks each open the file, read their byte ranges,
   decompress and decode their blobs to rows of the unified
   ``ELEMENT_SCHEMA`` (same schema the page-corpus extraction emits), so
   every downstream stage (projections, semi-joins, assembly) is shared
   verbatim with the pages path. Each blob decodes independently —
   parallelism = number of blobs.

Partitioning assumption: ``path`` must be readable from every worker node
(shared filesystem or fuse-mounted object store) — tasks read their own
byte ranges; the driver never ships payload bytes.

The protobuf wire-format decoding is hand-rolled against the public spec
(https://wiki.openstreetmap.org/wiki/PBF_Format) with numpy-vectorized
packed-varint / zigzag / delta decoding for the hot arrays (dense node
ids/coords, way refs, relation member ids). Field semantics (info keys
stringified, timestamp × date_granularity / 1000, node rows carry NO info
— the reference Node struct has none, relation.rs:18-24) mirror
mod.rs:199-266.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .osmxml import ELEMENT_SCHEMA

_TAGS_T = pa.map_(pa.string(), pa.string())


# ---------------------------------------------------------------------------
# protobuf wire format primitives
# ---------------------------------------------------------------------------


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
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


def _packed_varints_np(buf: bytes) -> np.ndarray:
    """Packed varint field → uint64 array, vectorized.

    Terminator bytes have the high bit clear; each value is at most 10
    bytes, so ten vectorized passes assemble every value at once instead
    of a per-byte Python loop."""
    if not buf:
        return np.empty(0, np.uint64)
    b = np.frombuffer(buf, np.uint8)
    ends = np.nonzero((b & 0x80) == 0)[0]
    starts = np.empty(len(ends), np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    vals = np.zeros(len(ends), np.uint64)
    for k in range((int((ends - starts).max()) + 1) if len(ends) else 0):
        pos = starts + k
        valid = pos <= ends
        if not valid.any():
            break
        vals[valid] |= (b[pos[valid]].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(
            7 * k
        )
    return vals


def _zigzag_np(v: np.ndarray) -> np.ndarray:
    s = v.astype(np.uint64)
    return ((s >> np.uint64(1)) ^ (~(s & np.uint64(1)) + np.uint64(1))).astype(np.int64)


def _packed_svarints_np(buf: bytes) -> np.ndarray:
    return _zigzag_np(_packed_varints_np(buf))


def _delta_np(v: np.ndarray) -> np.ndarray:
    return np.cumsum(v, dtype=np.int64)


def _zigzag1(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


# ---------------------------------------------------------------------------
# blob framing scan (driver-side index; payloads are never read here)
# ---------------------------------------------------------------------------


def scan_pbf_blobs(path: str) -> list[tuple[int, int]]:
    """→ [(offset, size)] of every OSMData blob (header blobs skipped)."""
    out: list[tuple[int, int]] = []
    with open(path, "rb") as f:
        while True:
            hdr_len_b = f.read(4)
            if len(hdr_len_b) < 4:
                break
            (hdr_len,) = struct.unpack(">i", hdr_len_b)
            header = f.read(hdr_len)
            btype = b""
            datasize = 0
            for field, _wt, v in _fields(header):
                if field == 1:
                    btype = v
                elif field == 3:
                    datasize = v
            offset = f.tell()
            if btype == b"OSMData":
                out.append((offset, datasize))
            f.seek(offset + datasize)
    return out


# ---------------------------------------------------------------------------
# blob → ELEMENT_SCHEMA rows
# ---------------------------------------------------------------------------


def _decode_info(buf: bytes, strings: list, date_granularity: int) -> list:
    info = []
    for field, _wt, v in _fields(buf):
        if field == 1:
            info.append(("version", str(v)))
        elif field == 2:
            info.append(("timestamp", str(v * date_granularity // 1000)))
        elif field == 3:
            info.append(("changeset", str(v)))
        elif field == 4:
            info.append(("uid", str(v)))
        elif field == 5:
            info.append(("user", strings[v].decode("utf-8")))
        elif field == 6:
            info.append(("visible", "true" if v else "false"))
    return info


class _Rows:
    """Column accumulators for one blob's ELEMENT_SCHEMA table."""

    def __init__(self):
        self.kind: list = []
        self.id: list = []
        self.lat: list = []
        self.lon: list = []
        self.tags: list = []
        self.info: list = []
        self.node_refs: list = []
        self.member_roles: list = []
        self.member_refs: list = []
        self.member_types: list = []

    def add(self, kind, eid, lat=None, lon=None, tags=(), info=(), node_refs=None,
            member_roles=None, member_refs=None, member_types=None):
        self.kind.append(kind)
        self.id.append(eid)
        self.lat.append(lat)
        self.lon.append(lon)
        self.tags.append(list(tags))
        self.info.append(list(info))
        self.node_refs.append(node_refs)
        self.member_roles.append(member_roles)
        self.member_refs.append(member_refs)
        self.member_types.append(member_types)

    def table(self) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(self.kind, pa.string()),
                "id": pa.array(self.id, pa.int64()),
                "lat": pa.array(self.lat, pa.float64()),
                "lon": pa.array(self.lon, pa.float64()),
                "tags": pa.array(self.tags, _TAGS_T),
                "info": pa.array(self.info, _TAGS_T),
                "node_refs": pa.array(self.node_refs, pa.list_(pa.int64())),
                "member_roles": pa.array(self.member_roles, pa.list_(pa.string())),
                "member_refs": pa.array(self.member_refs, pa.list_(pa.int64())),
                "member_types": pa.array(self.member_types, pa.list_(pa.int8())),
            }
        )


def decode_primitive_block(raw: bytes) -> pa.Table:
    """One decompressed PrimitiveBlock → ELEMENT_SCHEMA rows."""
    strings: list[bytes] = []
    groups: list[bytes] = []
    granularity = 100
    lat_offset = 0
    lon_offset = 0
    date_granularity = 1000
    for field, _wt, v in _fields(raw):
        if field == 1:
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    strings.append(v2)
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

    sdec = [None] * len(strings)

    def s(i: int) -> str:
        v = sdec[i]
        if v is None:
            v = strings[i].decode("utf-8")
            sdec[i] = v
        return v

    rows = _Rows()

    def coord(off: int, raw_v) -> np.ndarray:
        return 1e-9 * (off + granularity * np.asarray(raw_v, dtype=np.float64))

    for g in groups:
        for field, _wt, v in _fields(g):
            if field == 1:  # plain Node (rare; dense is the norm)
                nid = None
                lat = lon = 0.0
                keys = vals = np.empty(0, np.uint64)
                for f2, w2, v2 in _fields(v):
                    if f2 == 1:
                        nid = _zigzag1(v2) if w2 == 0 else v2
                    elif f2 == 2:
                        keys = _packed_varints_np(v2)
                    elif f2 == 3:
                        vals = _packed_varints_np(v2)
                    elif f2 == 8:
                        lat = float(coord(lat_offset, _zigzag1(v2)))
                    elif f2 == 9:
                        lon = float(coord(lon_offset, _zigzag1(v2)))
                tags = [(s(int(k)), s(int(w))) for k, w in zip(keys, vals)]
                rows.add("node", nid, lat=lat, lon=lon, tags=tags)
            elif field == 2:  # DenseNodes
                ids = lats = lons = np.empty(0, np.int64)
                keys_vals = np.empty(0, np.uint64)
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        ids = _delta_np(_packed_svarints_np(v2))
                    elif f2 == 8:
                        lats = _delta_np(_packed_svarints_np(v2))
                    elif f2 == 9:
                        lons = _delta_np(_packed_svarints_np(v2))
                    elif f2 == 10:
                        keys_vals = _packed_varints_np(v2)
                flat_lat = coord(lat_offset, lats)
                flat_lon = coord(lon_offset, lons)
                kv_i = 0
                kv = keys_vals
                has_tags = len(kv) > len(ids)  # all-delimiter ⇒ tagless
                for idx in range(len(ids)):
                    tags = []
                    if has_tags:
                        while kv_i < len(kv) and kv[kv_i] != 0:
                            tags.append((s(int(kv[kv_i])), s(int(kv[kv_i + 1]))))
                            kv_i += 2
                        kv_i += 1
                    rows.add(
                        "node",
                        int(ids[idx]),
                        lat=float(flat_lat[idx]),
                        lon=float(flat_lon[idx]),
                        tags=tags,
                    )
            elif field == 3:  # Way
                wid = None
                keys = vals = np.empty(0, np.uint64)
                refs = np.empty(0, np.int64)
                info: list = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        keys = _packed_varints_np(v2)
                    elif f2 == 3:
                        vals = _packed_varints_np(v2)
                    elif f2 == 4:
                        info = _decode_info(v2, strings, date_granularity)
                    elif f2 == 8:
                        refs = _delta_np(_packed_svarints_np(v2))
                tags = [(s(int(k)), s(int(w))) for k, w in zip(keys, vals)]
                rows.add("way", wid, tags=tags, info=info, node_refs=refs.tolist())
            elif field == 4:  # Relation
                rid = None
                keys = vals = roles = types = np.empty(0, np.uint64)
                memids = np.empty(0, np.int64)
                info = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        rid = v2
                    elif f2 == 2:
                        keys = _packed_varints_np(v2)
                    elif f2 == 3:
                        vals = _packed_varints_np(v2)
                    elif f2 == 4:
                        info = _decode_info(v2, strings, date_granularity)
                    elif f2 == 8:
                        roles = _packed_varints_np(v2)
                    elif f2 == 9:
                        memids = _delta_np(_packed_svarints_np(v2))
                    elif f2 == 10:
                        types = _packed_varints_np(v2)
                tags = [(s(int(k)), s(int(w))) for k, w in zip(keys, vals)]
                rows.add(
                    "relation",
                    rid,
                    tags=tags,
                    info=info,
                    member_roles=[s(int(r)) for r in roles],
                    member_refs=memids.tolist(),
                    member_types=[int(t) for t in types],
                )
    return rows.table()


def decode_blob(blob: bytes) -> pa.Table:
    """One OSMData Blob message (possibly zlib-compressed) → element rows."""
    raw = b""
    for field, _wt, v in _fields(blob):
        if field == 1:
            raw = v
        elif field == 3:
            raw = zlib.decompress(v)
    return decode_primitive_block(raw)


# ---------------------------------------------------------------------------
# Dataset source
# ---------------------------------------------------------------------------


def read_pbf_elements(
    path: str, *, override_num_blocks: Optional[int] = None
) -> rd.Dataset:
    """``.osm.pbf`` → unified ELEMENT_SCHEMA Dataset (see module docstring).

    Drop-in replacement for the pages→extract front half: feed the result
    to ``build_parser_tables`` and every downstream stage is shared."""
    blobs = scan_pbf_blobs(path)
    if not blobs:
        return rd.from_arrow(ELEMENT_SCHEMA.empty_table())
    if override_num_blocks is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        override_num_blocks = max(1, min(len(blobs), 2 * cpus))
    items = [{"offset": o, "size": sz} for o, sz in blobs]
    ds = rd.from_items(items, override_num_blocks=override_num_blocks)

    def decode(batch: pa.Table) -> pa.Table:
        offs = batch["offset"].to_pylist()
        sizes = batch["size"].to_pylist()
        tables = []
        with open(path, "rb") as f:
            for o, sz in zip(offs, sizes):
                f.seek(o)
                tables.append(decode_blob(f.read(sz)))
        if not tables:
            return ELEMENT_SCHEMA.empty_table()
        return pa.concat_tables(tables).combine_chunks()

    return ds.map_batches(decode, batch_format="pyarrow")


__all__ = [
    "decode_blob",
    "decode_primitive_block",
    "read_pbf_elements",
    "scan_pbf_blobs",
]
