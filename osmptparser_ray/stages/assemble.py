"""Relation resolution + flatten: the reference's J3/J4 joins and
``get_public_transports`` / ``get_areas`` drivers (mod.rs:511-654,
664-722), Ray-Data-first.

Two physical strategies, identical results (tested against each other):

* ``mode="broadcast"`` (default): the member-way and node lookup tables are
  ``ray.put`` once and read by every assembly actor (they are the SMALL
  side — ids/coords only, pruned by the semi-joins). Per-relation
  resolution is then a local dict lookup inside ``map_batches`` — no
  shuffle at all. This mirrors the reference's shared read-only cache and
  is the right plan while ways+nodes-of-interest fit a worker's heap
  (country-scale OSM ≈ a few GB).

* ``mode="shuffle"``: fully distributed — explode relation members, hash
  join (`Dataset.join`) against ways on way_id, explode node refs, hash
  join against nodes on node_id, then ``groupby(relation_id)`` reassembly
  ordered by (member_pos, node_pos). Inner joins realize the reference's
  silent missing-way/node filtering (mod.rs:672/680/693). This is the
  10^12-scale path; partitioning key is the relation id end-to-end.

Missing ways/nodes are silently dropped in both modes; member order and
per-way node order are preserved (explicit member_pos/node_pos columns in
the shuffle path).
"""

from __future__ import annotations

from functools import partial
from typing import Literal, NamedTuple, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..kernel.geometry import NodeSeq, flatten_relation, flatten_single_way
from ..util import default_actor_concurrency
from .elements import ParserTables

TAGS_T = pa.map_(pa.string(), pa.string())
STOP_T = pa.struct(
    [
        pa.field("id", pa.int64()),
        pa.field("lat", pa.float64()),
        pa.field("lon", pa.float64()),
        pa.field("tags", TAGS_T),
    ]
)
POINT_T = pa.struct([pa.field("lon", pa.float64()), pa.field("lat", pa.float64())])
GEOM_T = pa.list_(pa.list_(POINT_T))

PT_SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field("tags", TAGS_T),
        pa.field("info", TAGS_T),
        pa.field("stops", pa.list_(STOP_T)),
        pa.field("geometry", GEOM_T),
        pa.field("status_code", pa.int64()),
        pa.field("status_detail", pa.string()),
    ]
)

AREA_SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field("id_type", pa.string()),  # 'r' | 'w'
        pa.field("tags", TAGS_T),
        pa.field("info", TAGS_T),
        pa.field("geometry", GEOM_T),
        pa.field("status_code", pa.int64()),
        pa.field("status_detail", pa.string()),
    ]
)


def _geometry_value(segments) -> list:
    return [
        [{"lon": float(lon), "lat": float(lat)} for lon, lat in zip(seg.lons, seg.lats)]
        for seg in segments
    ]


def _pack_geometry(segments) -> bytes:
    """Flattened segments → one binary blob (join-safe payload).

    Layout: [n_segs:i64][seg lengths:i64×n][all lons:f64][all lats:f64].
    Acero hash joins cannot carry nested columns as non-key fields, so
    geometry crosses the shuffle-mode metadata join packed (same trick as
    the ring blobs in spatial.join)."""
    lens = np.array([len(s.lons) for s in segments], dtype=np.int64)
    lons = (
        np.concatenate([np.asarray(s.lons, np.float64) for s in segments])
        if segments
        else np.empty(0, np.float64)
    )
    lats = (
        np.concatenate([np.asarray(s.lats, np.float64) for s in segments])
        if segments
        else np.empty(0, np.float64)
    )
    return (
        np.array([len(lens)], dtype=np.int64).tobytes()
        + lens.tobytes()
        + lons.tobytes()
        + lats.tobytes()
    )


def _unpack_geometry(blob: bytes) -> list:
    """Inverse of ``_pack_geometry`` → the GEOM_T python value."""
    nseg = int(np.frombuffer(blob, np.int64, 1)[0])
    lens = np.frombuffer(blob, np.int64, nseg, offset=8)
    total = int(lens.sum())
    off = 8 + 8 * nseg
    lons = np.frombuffer(blob, np.float64, total, offset=off)
    lats = np.frombuffer(blob, np.float64, total, offset=off + 8 * total)
    out, pos = [], 0
    for n in lens:
        n = int(n)
        out.append(
            [
                {"lon": float(lons[pos + i]), "lat": float(lats[pos + i])}
                for i in range(n)
            ]
        )
        pos += n
    return out


class WayIndex(NamedTuple):
    """Columnar member-way lookup: sorted-id permutation over CSR refs.

    ``ids`` is sorted for binary search; ``rows[i]`` maps back to the
    UNSORTED CSR row, so the flat refs array is never reshuffled (reordering
    it costs a python loop or a giant gather — the permutation costs one
    argsort). Shared through the object store as plain numpy arrays —
    zero-copy reads in every assembly task.
    """

    ids: np.ndarray  # int64, sorted (deduped last-wins)
    rows: np.ndarray  # int64: position in the original CSR ordering
    ref_offsets: np.ndarray  # int64, len == n_original+1 (UNSORTED order)
    refs: np.ndarray  # int64 flat (UNSORTED order)

    def lookup(self, way_id: int):
        i = int(np.searchsorted(self.ids, way_id))
        if i >= len(self.ids) or self.ids[i] != way_id:
            return None
        r = self.rows[i]
        return self.refs[self.ref_offsets[r] : self.ref_offsets[r + 1]]


class NodeIndex(NamedTuple):
    """Columnar node-coord lookup (sorted ids) + stop-only tag columns.

    Stop tags are an Arrow map array aligned with a sorted id array — NOT a
    python dict: a dict of ~10^6 entries costs seconds to unpickle in EVERY
    worker process, while Arrow/numpy payloads are (near-)zero-copy plasma
    reads. Tags cover ONLY ids that appear as relation stop members."""

    ids: np.ndarray  # int64, sorted
    lats: np.ndarray
    lons: np.ndarray
    stop_ids: np.ndarray  # int64, sorted (subset of ids)
    stop_tags: "pa.Array"  # map<string,string>, aligned with stop_ids

    def gather(self, ref_ids: np.ndarray):
        """refs → (found_ids, lats, lons), silently dropping missing nodes
        (reference mod.rs:680)."""
        refs = np.asarray(ref_ids, dtype=np.int64)
        ok, lats, lons = self.gather_mask(refs)
        return refs[ok], lats[ok], lons[ok]

    def gather_mask(self, refs: np.ndarray):
        """refs → (ok mask, lats, lons) with lats/lons valid where ok —
        the bulk form: ONE call per batch instead of one per way."""
        n = len(refs)
        if not len(self.ids):
            return np.zeros(n, dtype=bool), np.empty(n), np.empty(n)
        idx = np.minimum(np.searchsorted(self.ids, refs), len(self.ids) - 1)
        ok = self.ids[idx] == refs
        lats = np.empty(n, np.float64)
        lons = np.empty(n, np.float64)
        lats[ok] = self.lats[idx[ok]]
        lons[ok] = self.lons[idx[ok]]
        return ok, lats, lons

    def stops_bulk(self, stop_ids_flat: np.ndarray):
        """Bulk stop resolution for MANY stop ids at once (C-path arrow
        take + one to_pylist). → (found_mask, lats, lons, tags_list);
        missing stops yield found_mask False (mod.rs:693)."""
        refs = np.asarray(stop_ids_flat, dtype=np.int64)
        n = len(refs)
        if len(self.ids) == 0 or n == 0:
            return np.zeros(n, bool), np.empty(0), np.empty(0), []
        idx = np.searchsorted(self.ids, refs)
        idx_c = np.minimum(idx, len(self.ids) - 1)
        ok = self.ids[idx_c] == refs
        sel = idx_c[ok]
        lats, lons = self.lats[sel], self.lons[sel]
        # tags: align through the sorted stop-id subset
        found = refs[ok]
        tpos = np.searchsorted(self.stop_ids, found)
        tpos_c = np.minimum(tpos, max(len(self.stop_ids) - 1, 0))
        thit = (
            self.stop_ids[tpos_c] == found
            if len(self.stop_ids)
            else np.zeros(len(found), bool)
        )
        tags_list: list = [[]] * len(found)
        if thit.any():
            taken = self.stop_tags.take(pa.array(tpos_c[thit], pa.int64())).to_pylist()
            k = 0
            for i in np.nonzero(thit)[0]:
                tags_list[int(i)] = taken[k]
                k += 1
        return ok, lats, lons, tags_list


def build_way_index(ways: rd.Dataset) -> WayIndex:
    """Member ways → WayIndex.

    The per-block work (member filter, list flatten, int64 casts) runs
    DISTRIBUTED — map tasks emit one packed binary blob triple per block,
    and the driver only ``frombuffer``s + concatenates + does the single
    final argsort. At high CPU counts the driver-side share of the index
    build is the serial floor of the broadcast assembly plan; this keeps
    it at memcpy + one sort."""

    def pack(b: pa.Table) -> pa.Table:
        b = b.filter(b["is_member"])
        refs = b["node_refs"].combine_chunks()
        ids = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.list_value_length(refs).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = refs.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "ids": pa.array([ids.tobytes()], pa.binary()),
                "lens": pa.array([lens.tobytes()], pa.binary()),
                "refs": pa.array([flat.tobytes()], pa.binary()),
            }
        )

    ids_parts, len_parts, ref_parts = [], [], []
    packed = ways.select_columns(["id", "node_refs", "is_member"]).map_batches(
        pack, batch_format="pyarrow", batch_size=1 << 17
    )
    for b in packed.iter_batches(batch_size=64, batch_format="pyarrow"):
        for i_, l_, r_ in zip(
            b["ids"].to_pylist(), b["lens"].to_pylist(), b["refs"].to_pylist()
        ):
            ids_parts.append(np.frombuffer(i_, np.int64))
            len_parts.append(np.frombuffer(l_, np.int64))
            ref_parts.append(np.frombuffer(r_, np.int64))
    if not ids_parts:
        z = np.empty(0, np.int64)
        return WayIndex(z, z, np.zeros(1, np.int64), z)
    ids = np.concatenate(ids_parts)
    lens = np.concatenate(len_parts)
    refs = np.concatenate(ref_parts)
    offs = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    # sorted-id permutation; duplicate ids keep the LAST occurrence,
    # matching the reference's HashMap last-wins merge (mod.rs:422).
    # No ref movement — fully vectorized.
    order = np.argsort(ids, kind="stable")
    ids_sorted = ids[order]
    keep = np.ones(len(ids_sorted), dtype=bool)
    keep[:-1] = ids_sorted[:-1] != ids_sorted[1:]
    return WayIndex(ids_sorted[keep], order[keep], offs, refs)


def build_node_index(nodes: rd.Dataset, stop_ids: Optional[np.ndarray] = None) -> NodeIndex:
    """Nodes → NodeIndex; tags kept (columnar) only for ``stop_ids`` (or all
    nodes when ``stop_ids`` is None).

    Like ``build_way_index``, the per-block conversion (casts, stop-id
    membership filter, tag sub-array slicing) runs distributed; blobs come
    back packed (numpy buffers + one Arrow-IPC stream for the tag arrays)
    and the driver's share is memcpy + the two final argsorts."""
    stop_sorted = (
        np.sort(np.asarray(stop_ids, dtype=np.int64)) if stop_ids is not None else None
    )
    stop_ref = ray.put(stop_sorted)

    def pack(b: pa.Table) -> pa.Table:
        from ..util import cached_get

        stops_s = cached_get(stop_ref)
        ids = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lats = b["lat"].to_numpy(zero_copy_only=False).astype(np.float64)
        lons = b["lon"].to_numpy(zero_copy_only=False).astype(np.float64)
        if stops_s is not None:
            if len(stops_s):
                pos = np.searchsorted(stops_s, ids)
                pos_c = np.minimum(pos, len(stops_s) - 1)
                hit = stops_s[pos_c] == ids
            else:
                hit = np.zeros(len(ids), dtype=bool)
            sids = ids[hit]
            stags = b["tags"].combine_chunks().filter(pa.array(hit))
        else:
            sids = ids
            stags = b["tags"].combine_chunks()
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, pa.schema([pa.field("tags", TAGS_T)])) as w:
            w.write_table(pa.table({"tags": stags}))
        return pa.table(
            {
                "ids": pa.array([ids.tobytes()], pa.binary()),
                "lats": pa.array([lats.tobytes()], pa.binary()),
                "lons": pa.array([lons.tobytes()], pa.binary()),
                "sids": pa.array([sids.tobytes()], pa.binary()),
                "stags_ipc": pa.array([sink.getvalue().to_pybytes()], pa.binary()),
            }
        )

    id_parts, lat_parts, lon_parts = [], [], []
    stop_id_parts: list = []
    stop_tag_tables: list = []
    packed = nodes.map_batches(pack, batch_format="pyarrow", batch_size=1 << 17)
    for b in packed.iter_batches(batch_size=64, batch_format="pyarrow"):
        for i_, la_, lo_, s_, tg_ in zip(
            b["ids"].to_pylist(),
            b["lats"].to_pylist(),
            b["lons"].to_pylist(),
            b["sids"].to_pylist(),
            b["stags_ipc"].to_pylist(),
        ):
            id_parts.append(np.frombuffer(i_, np.int64))
            lat_parts.append(np.frombuffer(la_, np.float64))
            lon_parts.append(np.frombuffer(lo_, np.float64))
            sids = np.frombuffer(s_, np.int64)
            if len(sids):
                stop_id_parts.append(sids)
                stop_tag_tables.append(
                    pa.ipc.open_stream(tg_).read_all()["tags"].combine_chunks()
                )
    return _merge_node_parts(id_parts, lat_parts, lon_parts, stop_id_parts, stop_tag_tables)


def _merge_node_parts(
    id_parts, lat_parts, lon_parts, stop_id_parts, stop_tag_arrays
) -> NodeIndex:
    """Concatenate per-block pieces (in BLOCK ORDER — last-wins depends on
    it, mod.rs:494) → sorted/deduped NodeIndex."""
    empty_tags = pa.array([], TAGS_T)
    if not id_parts:
        z = np.empty(0, np.int64)
        return NodeIndex(z, z.astype(np.float64), z.astype(np.float64), z, empty_tags)
    ids = np.concatenate(id_parts)
    lats = np.concatenate(lat_parts)
    lons = np.concatenate(lon_parts)
    order = np.argsort(ids, kind="stable")
    ids, lats, lons = ids[order], lats[order], lons[order]
    # last-wins dedup (mod.rs:494)
    keep = np.ones(len(ids), dtype=bool)
    keep[:-1] = ids[:-1] != ids[1:]
    if stop_id_parts:
        sids = np.concatenate(stop_id_parts)
        stags = pa.concat_arrays(
            [t if isinstance(t, pa.Array) else t.combine_chunks() for t in stop_tag_arrays]
        )
        sorder = np.argsort(sids, kind="stable")
        sids_sorted = sids[sorder]
        skeep = np.ones(len(sids_sorted), dtype=bool)
        skeep[:-1] = sids_sorted[:-1] != sids_sorted[1:]
        final_idx = sorder[skeep]
        stags = stags.take(pa.array(final_idx, pa.int64()))
        sids_final = sids_sorted[skeep]
    else:
        sids_final = np.empty(0, np.int64)
        stags = empty_tags
    return NodeIndex(ids[keep], lats[keep], lons[keep], sids_final, stags)


class ShardedNodeIndex:
    """Hash-sharded node lookup living ENTIRELY in the object store.

    The un-sharded ``NodeIndex`` is built by (and broadcast from) the
    driver — fine while nodes-of-interest fit one heap, but a serial
    section at high CPU counts and a hard wall at planet scale. Here the
    index never exists in one piece anywhere: split tasks partition each
    block's rows by ``id % P``, one merge task per shard sorts/dedups its
    slice, and the driver holds only P ObjectRefs. Workers resolve shards
    lazily through the per-process cache (same total bytes as the single
    broadcast, now scheduler-placed), and every lookup routes vectorized
    per-shard. API-compatible with ``NodeIndex`` (gather / stops_bulk).
    """

    def __init__(self, shard_refs: list, num_shards: int):
        self.shard_refs = shard_refs
        self.num_shards = num_shards
        self._shards: Optional[list] = None

    def _resolve(self) -> list:
        if self._shards is None:
            self._shards = [_cached_get(r) for r in self.shard_refs]
        return self._shards

    def gather(self, ref_ids: np.ndarray):
        refs = np.asarray(ref_ids, dtype=np.int64)
        ok, lats, lons = self.gather_mask(refs)
        return refs[ok], lats[ok], lons[ok]

    def gather_mask(self, refs: np.ndarray):
        """Bulk per-position form (see NodeIndex.gather_mask)."""
        refs = np.asarray(refs, dtype=np.int64)
        n = len(refs)
        ok = np.zeros(n, dtype=bool)
        lats = np.empty(n, np.float64)
        lons = np.empty(n, np.float64)
        if n == 0:
            return ok, lats, lons
        shards = self._resolve()
        sh = refs % self.num_shards
        for p in np.unique(sh):
            m = sh == p
            s = shards[int(p)]
            if len(s.ids) == 0:
                continue
            sub = refs[m]
            idx = np.minimum(np.searchsorted(s.ids, sub), len(s.ids) - 1)
            hit = s.ids[idx] == sub
            tmp_lat = np.empty(len(sub), np.float64)
            tmp_lon = np.empty(len(sub), np.float64)
            tmp_lat[hit] = s.lats[idx[hit]]
            tmp_lon[hit] = s.lons[idx[hit]]
            ok[m] = hit
            lats[m] = tmp_lat
            lons[m] = tmp_lon
        return ok, lats, lons

    def stops_bulk(self, stop_ids_flat: np.ndarray):
        refs = np.asarray(stop_ids_flat, dtype=np.int64)
        n = len(refs)
        if n == 0:
            return np.zeros(0, bool), np.empty(0), np.empty(0), []
        shards = self._resolve()
        sh = refs % self.num_shards
        ok = np.zeros(n, dtype=bool)
        lats = np.empty(n, np.float64)
        lons = np.empty(n, np.float64)
        tags_all: list = [None] * n
        for p in np.unique(sh):
            pos = np.nonzero(sh == p)[0]
            s = shards[int(p)]
            sub_ok, sub_lats, sub_lons, sub_tags = s.stops_bulk(refs[pos])
            hitpos = pos[sub_ok]
            ok[pos] = sub_ok
            lats[hitpos] = sub_lats
            lons[hitpos] = sub_lons
            for j, t in zip(hitpos, sub_tags):
                tags_all[int(j)] = t
        found = np.nonzero(ok)[0]
        return ok, lats[found], lons[found], [tags_all[int(j)] for j in found]


def _split_node_block(block, num_shards: int, stop_sorted):
    """One node block → per-shard pieces (ran as a Ray task, P returns).

    Ray's map operator emits a COLUMNLESS ``()`` empty block when a pyarrow
    UDF returns zero rows (kind-narrow PBF sources hit this, round-5) — an
    empty/columnless block contributes empty pieces to every shard."""
    b = block
    if b.num_rows == 0 or "id" not in b.schema.names:
        empty_tags = pa.chunked_array([], pa.map_(pa.string(), pa.string()))
        piece = (
            np.empty(0, np.int64), np.empty(0, np.float64),
            np.empty(0, np.float64), np.empty(0, np.int64), empty_tags,
        )
        return tuple(piece for _ in range(num_shards))
    ids = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lats = b["lat"].to_numpy(zero_copy_only=False).astype(np.float64)
    lons = b["lon"].to_numpy(zero_copy_only=False).astype(np.float64)
    tags = b["tags"].combine_chunks()
    pieces = []
    sh = ids % num_shards
    for p in range(num_shards):
        m = sh == p
        p_ids, p_lats, p_lons = ids[m], lats[m], lons[m]
        if stop_sorted is not None:
            if len(stop_sorted):
                pos = np.minimum(
                    np.searchsorted(stop_sorted, p_ids), len(stop_sorted) - 1
                )
                hit = stop_sorted[pos] == p_ids
            else:
                hit = np.zeros(len(p_ids), dtype=bool)
            p_sids = p_ids[hit]
            p_stags = tags.filter(pa.array(m)).filter(pa.array(hit))
        else:
            p_sids = p_ids
            p_stags = tags.filter(pa.array(m))
        pieces.append((p_ids, p_lats, p_lons, p_sids, p_stags))
    return tuple(pieces)


def _merge_node_shard(*pieces) -> NodeIndex:
    """Pieces of one shard (block order) → that shard's NodeIndex."""
    id_parts = [p[0] for p in pieces]
    lat_parts = [p[1] for p in pieces]
    lon_parts = [p[2] for p in pieces]
    stop_id_parts = [p[3] for p in pieces if len(p[3])]
    stop_tag_arrays = [p[4] for p in pieces if len(p[3])]
    return _merge_node_parts(
        id_parts, lat_parts, lon_parts, stop_id_parts, stop_tag_arrays
    )


def build_node_index_sharded(
    nodes: rd.Dataset,
    stop_ids: Optional[np.ndarray] = None,
    num_shards: Optional[int] = None,
) -> ShardedNodeIndex:
    """Node lookup built entirely in Ray tasks (see ShardedNodeIndex).

    The driver's role is reduced to launching split/merge tasks over the
    materialized blocks and holding P shard refs; block ORDER is
    preserved into every merge so last-wins dedup matches the reference.
    """
    if num_shards is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_shards = int(max(2, min(16, cpus // 2)))
    P = num_shards
    stop_sorted = (
        np.sort(np.asarray(stop_ids, dtype=np.int64)) if stop_ids is not None else None
    )
    stop_ref = ray.put(stop_sorted)

    split = ray.remote(_split_node_block)
    merge = ray.remote(_merge_node_shard)
    block_refs = []
    for bundle in nodes.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
    if not block_refs:
        z = np.empty(0, np.int64)
        empty = NodeIndex(
            z, z.astype(np.float64), z.astype(np.float64), z, pa.array([], TAGS_T)
        )
        return ShardedNodeIndex([ray.put(empty) for _ in range(P)], P)
    piece_refs = [
        split.options(num_returns=P).remote(bref, P, stop_ref) for bref in block_refs
    ]
    shard_refs = [
        merge.remote(*[piece_refs[i][p] for i in range(len(piece_refs))])
        for p in range(P)
    ]
    return ShardedNodeIndex(shard_refs, P)


def collect_stop_ids(relations: rd.Dataset) -> np.ndarray:
    parts = []
    for b in relations.select_columns(["stop_ids"]).iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        col = b["stop_ids"].combine_chunks()
        parts.append(col.flatten().to_numpy(zero_copy_only=False).astype(np.int64))
    return np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)


from ..util import cached_get as _cached_get


def _resolve_index(ref_or_index):
    """A broadcast side arrives either as an ObjectRef (un-sharded index,
    ``ray.put`` once) or as a ShardedNodeIndex whose refs resolve lazily
    per worker — accept both."""
    if isinstance(ref_or_index, (WayIndex, NodeIndex, ShardedNodeIndex)):
        return ref_or_index
    return _cached_get(ref_or_index)


class _BroadcastAssembler:
    """relations batch → flattened PublicTransport / relation-Area rows.

    Runs as stateless TASKS (elastic, low dispatch latency); the broadcast
    indexes are fetched through a per-worker-process cache, giving
    actor-style state amortization without actor-pool dispatch overhead.
    """

    def __init__(self, ways_ref, nodes_ref, gap: float, closed: bool, as_area: bool):
        self.ways: WayIndex = _resolve_index(ways_ref)
        self.nodes = _resolve_index(nodes_ref)
        self.gap = gap
        self.closed = closed
        self.as_area = as_area

    def _resolve_seqs(self, way_ids: list[int]) -> list[NodeSeq]:
        seqs = []
        for wid in way_ids:
            refs = self.ways.lookup(wid)
            if refs is None:
                continue  # missing way silently filtered (mod.rs:672)
            ids, lats, lons = self.nodes.gather(refs)
            if len(ids) == 0:
                # a way with zero RESOLVABLE nodes behaves like a missing
                # way (both modes drop it): the reference would push an
                # empty node vec and later index [0] out of it — we model
                # the silent-filter semantics instead, identically in the
                # broadcast and shuffle paths
                continue
            seqs.append(NodeSeq(ids, lats, lons))
        return seqs

    def _resolve_seqs_batch(self, way_ids_arr: "pa.Array") -> list[list[NodeSeq]]:
        """Way/node resolution for a WHOLE relations batch in three bulk
        array operations (round-3: the per-way ``gather`` calls — 63 per
        relation on the bench corpus — were half the assembly stage's CPU;
        numpy fixed overhead × 10^5 tiny calls). Semantics identical to
        looping ``_resolve_seqs``: missing ways and ways with zero
        resolvable nodes are silently dropped, order preserved."""
        wcol = way_ids_arr.combine_chunks() if isinstance(way_ids_arr, pa.ChunkedArray) else way_ids_arr
        woffs = np.asarray(wcol.offsets, np.int64)
        woffs = woffs - woffs[0]
        flat_wids = wcol.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        nrel = len(wcol)
        seqs_col: list[list[NodeSeq]] = [[] for _ in range(nrel)]
        if not len(flat_wids) or not len(self.ways.ids):
            return seqs_col
        # bulk way lookup: one searchsorted over every member way id
        wi = self.ways
        pos = np.minimum(np.searchsorted(wi.ids, flat_wids), len(wi.ids) - 1)
        found = wi.ids[pos] == flat_wids
        rows = wi.rows[pos[found]]
        starts = wi.ref_offsets[rows]
        lens = wi.ref_offsets[rows + 1] - starts
        total = int(lens.sum())
        # range-gather every found way's refs in one pass
        if total:
            cum = np.cumsum(lens)
            nz = lens > 0
            rs, rl = starts[nz], lens[nz]
            cumnz = np.cumsum(rl)
            idx = np.ones(total, np.int64)
            idx[0] = rs[0]
            idx[cumnz[:-1]] = rs[1:] - (rs[:-1] + rl[:-1]) + 1
            idx = np.cumsum(idx)
            all_refs = wi.refs[idx]
        else:
            all_refs = np.empty(0, np.int64)
        # ONE node gather for the whole batch
        ok, lats, lons = self.nodes.gather_mask(all_refs)
        way_start = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=way_start[1:])
        rel_of_flat = np.repeat(np.arange(nrel, dtype=np.int64), np.diff(woffs))
        rel_of_found = rel_of_flat[found]
        for k in range(len(lens)):
            s, e = way_start[k], way_start[k + 1]
            o = ok[s:e]
            ids_k = all_refs[s:e][o]
            if not len(ids_k):
                continue  # zero resolvable nodes == missing way
            seqs_col[rel_of_found[k]].append(
                NodeSeq(ids_k, lats[s:e][o], lons[s:e][o])
            )
        return seqs_col

    def _resolve_stops_col(self, stop_ids_arr: "pa.Array") -> "pa.ListArray":
        """Bulk stop resolution for a whole batch, assembled DIRECTLY as
        the arrow list<struct> column (round-3: the per-stop python dict
        building + python→arrow conversion was ~25% of assembly CPU).
        Missing stops silently filtered (mod.rs:693)."""
        scol = (
            stop_ids_arr.combine_chunks()
            if isinstance(stop_ids_arr, pa.ChunkedArray)
            else stop_ids_arr
        )
        seg = np.asarray(scol.offsets, np.int64)
        seg = seg - seg[0]
        flat = scol.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        ok, lats, lons, tags_list = self.nodes.stops_bulk(flat)
        # per-relation FOUND counts via prefix sums (reduceat mishandles
        # empty segments)
        c = np.zeros(len(flat) + 1, np.int64)
        np.cumsum(ok.astype(np.int64), out=c[1:])
        found_counts = c[seg[1:]] - c[seg[:-1]]
        offs = np.zeros(len(found_counts) + 1, np.int32)
        np.cumsum(found_counts, out=offs[1:])
        struct = pa.StructArray.from_arrays(
            [
                pa.array(flat[ok], pa.int64()),
                pa.array(lats, pa.float64()),
                pa.array(lons, pa.float64()),
                pa.array(tags_list, TAGS_T),
            ],
            ["id", "lat", "lon", "tags"],
        )
        return pa.ListArray.from_arrays(pa.array(offs, pa.int32()), struct)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        seqs_col = self._resolve_seqs_batch(batch["way_ids"])
        geoms, codes, details = [], [], []
        for seqs in seqs_col:
            segments, status = flatten_relation(seqs, self.gap, self.closed)
            geoms.append(_geometry_value(segments))
            codes.append(status.code)
            details.append(status.detail)
        stops_col = None if self.as_area else self._resolve_stops_col(batch["stop_ids"])
        cols = {
            "id": batch["id"],
            "tags": batch["tags"],
            "info": batch["info"],
        }
        if self.as_area:
            out = pa.table(
                {
                    "id": batch["id"],
                    "id_type": pa.array(["r"] * len(ids), pa.string()),
                    "tags": batch["tags"],
                    "info": batch["info"],
                    "geometry": pa.array(geoms, GEOM_T),
                    "status_code": pa.array(codes, pa.int64()),
                    "status_detail": pa.array(details, pa.string()),
                }
            )
            return out
        cols["stops"] = stops_col
        cols["geometry"] = pa.array(geoms, GEOM_T)
        cols["status_code"] = pa.array(codes, pa.int64())
        cols["status_detail"] = pa.array(details, pa.string())
        return pa.table(cols)


class _WayAreaFlattener:
    """standalone ways → 'w'-type Area rows (reference mod.rs:596-647).

    Needs only node coords for the way's own refs → broadcast node lookup.
    """

    def __init__(self, nodes_ref, gap: float):
        self.nodes = _resolve_index(nodes_ref)
        self.gap = gap

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(batch["is_standalone"])
        ids = batch["id"].to_pylist()
        # bulk node resolution for the whole batch (one gather_mask, not
        # one gather per way — same round-3 rewrite as _BroadcastAssembler)
        refs_arr = batch["node_refs"].combine_chunks()
        offs = np.asarray(refs_arr.offsets, np.int64)
        offs = offs - offs[0]
        flat = refs_arr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        ok, lats_f, lons_f = self.nodes.gather_mask(flat)
        geoms, codes, details = [], [], []
        for i in range(len(ids)):
            s, e = offs[i], offs[i + 1]
            o = ok[s:e]
            seq = NodeSeq(flat[s:e][o], lats_f[s:e][o], lons_f[s:e][o])
            segments, status = flatten_single_way(seq, self.gap, True)
            geoms.append(_geometry_value(segments))
            codes.append(status.code)
            details.append(status.detail)
        return pa.table(
            {
                "id": batch["id"],
                "id_type": pa.array(["w"] * len(ids), pa.string()),
                "tags": batch["tags"],
                "info": batch["info"],
                "geometry": pa.array(geoms, GEOM_T),
                "status_code": pa.array(codes, pa.int64()),
                "status_detail": pa.array(details, pa.string()),
            }
        )


def _assemble_task(batch: pa.Table, *, ways_ref, nodes_ref, gap, closed, as_area) -> pa.Table:
    """Task-form wrapper: construction is cheap given _cached_get."""
    return _BroadcastAssembler(ways_ref, nodes_ref, gap, closed, as_area)(batch)


def _way_area_task(batch: pa.Table, *, nodes_ref, gap) -> pa.Table:
    return _WayAreaFlattener(nodes_ref, gap)(batch)


def get_public_transports(
    tables: ParserTables,
    gap: float,
    *,
    mode: Literal["broadcast", "shuffle"] = "broadcast",
    num_partitions: Optional[int] = None,
    concurrency: Optional[int | tuple[int, int]] = None,
) -> rd.Dataset:
    """All filtered relations flattened (open) → PublicTransport rows.

    Reference: get_public_transports (mod.rs:511-527). Output order is
    nondeterministic, matching the reference's channel-drain order.
    """
    if mode == "shuffle":
        return _assemble_shuffle(tables, gap, closed=False, as_area=False,
                                 num_partitions=num_partitions)
    # the node index builds SHARDED in Ray tasks (driver holds refs only);
    # the (much smaller) way index collects concurrently on a driver thread
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_ways = pool.submit(lambda: ray.put(build_way_index(tables.ways)))
        f_nodes = pool.submit(
            lambda: build_node_index_sharded(
                tables.nodes, collect_stop_ids(tables.relations)
            )
        )
        ways_ref = f_ways.result()
        nodes_ref = f_nodes.result()
    return tables.relations.map_batches(
        partial(
            _assemble_task,
            ways_ref=ways_ref,
            nodes_ref=nodes_ref,
            gap=gap,
            closed=False,
            as_area=False,
        ),
        batch_format="pyarrow",
    )


def get_areas(
    tables: ParserTables,
    gap: float,
    *,
    mode: Literal["broadcast", "shuffle"] = "broadcast",
    num_partitions: Optional[int] = None,
    concurrency: Optional[int | tuple[int, int]] = None,
) -> rd.Dataset:
    """Relation areas ('r', closed) ∪ standalone way areas ('w', closed).

    Reference: get_areas (mod.rs:580-654). The library returns ALL rows
    including Broken; CLI-parity filtering (drop status!=0 / empty
    geometry, bin.rs:68-73) is `cli_area_filter`.
    """
    nodes_ref = build_node_index_sharded(tables.nodes)
    if mode == "shuffle":
        rel_areas = _assemble_shuffle(tables, gap, closed=True, as_area=True,
                                      num_partitions=num_partitions)
    else:
        ways_ref = ray.put(build_way_index(tables.ways))
        rel_areas = tables.relations.map_batches(
            partial(
                _assemble_task,
                ways_ref=ways_ref,
                nodes_ref=nodes_ref,
                gap=gap,
                closed=True,
                as_area=True,
            ),
            batch_format="pyarrow",
        )
    way_areas = tables.ways.map_batches(
        partial(_way_area_task, nodes_ref=nodes_ref, gap=gap),
        batch_format="pyarrow",
    )
    return rel_areas.union(way_areas)


def cli_area_filter(areas: rd.Dataset) -> rd.Dataset:
    """CLI-parity output filter: keep only status==0 with non-empty geometry
    (reference bin.rs:68-73)."""

    def keep(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.equal(batch["status_code"], 0),
            pc.greater(pc.list_value_length(batch["geometry"]), 0),
        )
        return batch.filter(ok)

    return areas.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# shuffle-mode assembly (the 10^12-scale path)
# ---------------------------------------------------------------------------


def _explode_members(batch: pa.Table) -> pa.Table:
    """relations → one row per (relation_id, member_pos, way_id)."""
    ids = batch["id"].to_numpy(zero_copy_only=False)
    way_lists = batch["way_ids"].to_pylist()
    counts = np.array([len(w) for w in way_lists], dtype=np.int64)
    rel_ids = np.repeat(ids, counts)
    member_pos = np.concatenate([np.arange(c) for c in counts]) if len(counts) else np.empty(0, np.int64)
    way_ids = np.concatenate([np.asarray(w, dtype=np.int64) for w in way_lists]) if way_lists else np.empty(0, np.int64)
    return pa.table(
        {
            "relation_id": pa.array(rel_ids, pa.int64()),
            "member_pos": pa.array(member_pos.astype(np.int64), pa.int64()),
            "way_id": pa.array(way_ids, pa.int64()),
        }
    )


def _explode_way_refs(batch: pa.Table) -> pa.Table:
    """member ways → one row per (way_id, node_pos, node_id).

    Refs are exploded BEFORE the hash join so every join payload is scalar
    (pyarrow's hash join cannot carry list columns as non-key fields).
    """
    batch = batch.filter(batch["is_member"])
    refs = batch["node_refs"].combine_chunks()
    counts = pc.list_value_length(refs).to_numpy(zero_copy_only=False).astype(np.int64)
    wids = np.repeat(batch["id"].to_numpy(zero_copy_only=False), counts)
    node_pos = (
        np.concatenate([np.arange(c) for c in counts]) if len(counts) else np.empty(0, np.int64)
    )
    node_ids = refs.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "way_id": pa.array(wids, pa.int64()),
            "node_pos": pa.array(node_pos.astype(np.int64), pa.int64()),
            "node_id": pa.array(node_ids, pa.int64()),
        }
    )


def _group_flatten(g: pd.DataFrame, gap: float, closed: bool) -> pd.DataFrame:
    """Per-relation reassembly + flatten for the shuffle path (map_groups).

    Null ``lat`` rows are unmatched left-outer join probes: a missing way
    (no node rows at all) or a missing node — both silently dropped, the
    reference's resolution semantics (mod.rs:672/680/693). The relation's
    metadata sentinel row (member_pos == -1, non-null ``meta_blob``) is
    split out and its blob carried through to the finishing stage; it has a
    null ``lat`` so the dropna also removes it from the geometry rows. A
    relation whose every member is missing still yields a group (its
    sentinel/unmatched rows), giving seqs=[] → 501 Broken + empty geometry,
    exactly like the reference.
    """
    rid = int(g["relation_id"].iloc[0])
    mb = g["meta_blob"].dropna()
    meta_blob = mb.iloc[0] if len(mb) else b""
    g = g.dropna(subset=["lat"])
    g = g.sort_values(["member_pos", "node_pos"], kind="stable")
    seqs: list[NodeSeq] = []
    for _pos, way in g.groupby("member_pos", sort=True):
        seqs.append(
            NodeSeq.build(
                way["node_id"].to_numpy(dtype=np.int64),
                way["lat"].to_numpy(),
                way["lon"].to_numpy(),
            )
        )
    segments, status = flatten_relation(seqs, gap, closed)
    return pd.DataFrame(
        {
            "id": [rid],
            "geom_blob": [_pack_geometry(segments)],
            "meta_blob": [meta_blob],
            "status_code": [status.code],
            "status_detail": [status.detail],
        }
    )


def _assemble_shuffle(
    tables: ParserTables,
    gap: float,
    *,
    closed: bool,
    as_area: bool,
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Distributed explode→join→regroup assembly (see module docstring).

    All join payloads are scalar int64/float64/binary columns (refs exploded
    before joining; nested metadata/geometry cross joins as per-relation
    binary blobs); nothing relation-scale is ever collected on the driver —
    the only broadcast side is the stop-member node lookup, pruned to stop
    ids. LEFT OUTER joins preserve relations/ways whose refs are missing so
    the silent-filter semantics match the reference exactly.
    """
    # Size the shuffle to the cluster: each hash-join partition pins an
    # aggregator ACTOR; two joins run concurrently in one streaming plan, so
    # unbounded partitions × 1 CPU each can deadlock a small session (all
    # CPUs held by idle aggregators, none left for the map tasks feeding
    # them). Fractional aggregator CPUs keep map tasks schedulable.
    from ..util import JOIN_AGG_ARGS, join_partitions

    npart = num_partitions or join_partitions()
    agg_args = JOIN_AGG_ARGS
    members = tables.relations.map_batches(_explode_members, batch_format="pyarrow")
    way_nodes = tables.ways.map_batches(_explode_way_refs, batch_format="pyarrow")
    joined_ways = members.join(
        way_nodes,
        join_type="left_outer",
        num_partitions=npart,
        on=("way_id",),
        aggregator_ray_remote_args=agg_args,
    )
    node_coords = tables.nodes.select_columns(["id", "lat", "lon"])
    joined_nodes = joined_ways.join(
        node_coords,
        join_type="left_outer",
        num_partitions=npart,
        on=("node_id",),
        right_on=("id",),
        aggregator_ray_remote_args=agg_args,
    )
    # relation metadata (nested tags/info/stop_ids) crosses the reassembly
    # shuffle as per-relation SENTINEL ROWS (member_pos = -1, one pickled
    # binary blob each) unioned into the joined node stream — NO driver-side
    # dict, NO extra join. The sentinel rides the same relation_id-keyed
    # groupby the geometry rows take; `_group_flatten` splits it back out.
    # (A third hash join was tried and rejected: empty groupby partitions
    # emit zero-column blocks that bypass map_batches, and Acero hard-fails
    # resolving a key on a schema-less side.) Bonus: a relation whose every
    # member is missing still reaches the output via its sentinel row.
    import pickle

    row_cols = [
        "relation_id",
        "member_pos",
        "way_id",
        "node_pos",
        "node_id",
        "lat",
        "lon",
        "meta_blob",
    ]

    def _with_meta_null(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "meta_blob", pa.nulls(batch.num_rows, pa.binary())
        )
        return batch.select(row_cols)

    node_rows = joined_nodes.map_batches(_with_meta_null, batch_format="pyarrow")

    def _meta_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        blobs = [
            pickle.dumps((t, i, s), protocol=pickle.HIGHEST_PROTOCOL)
            for t, i, s in zip(
                batch["tags"].to_pylist(),
                batch["info"].to_pylist(),
                batch["stop_ids"].to_pylist(),
            )
        ]
        return pa.table(
            {
                "relation_id": batch["id"],
                "member_pos": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "way_id": pa.nulls(n, pa.int64()),
                "node_pos": pa.nulls(n, pa.int64()),
                "node_id": pa.nulls(n, pa.int64()),
                "lat": pa.nulls(n, pa.float64()),
                "lon": pa.nulls(n, pa.float64()),
                "meta_blob": pa.array(blobs, pa.binary()),
            }
        )

    meta_rows = tables.relations.map_batches(_meta_rows, batch_format="pyarrow")
    with_meta = node_rows.union(meta_rows).groupby("relation_id").map_groups(
        partial(_group_flatten, gap=gap, closed=closed), batch_format="pandas"
    )
    nodes_ref = (
        build_node_index_sharded(tables.nodes, collect_stop_ids(tables.relations))
        if not as_area
        else None
    )

    class FinishMeta:
        """Decode joined meta/geometry blobs (+ resolve stops for PT rows)."""

        def __init__(self):
            self.nodes = _resolve_index(nodes_ref) if nodes_ref is not None else None

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["id"].to_pylist()
            metas = [pickle.loads(b) for b in batch["meta_blob"].to_pylist()]
            geom = pa.array(
                [_unpack_geometry(b) for b in batch["geom_blob"].to_pylist()], GEOM_T
            )
            cols: dict = {"id": batch["id"]}
            if as_area:
                cols["id_type"] = pa.array(["r"] * len(ids), pa.string())
            cols["tags"] = pa.array([m[0] for m in metas], TAGS_T)
            cols["info"] = pa.array([m[1] for m in metas], TAGS_T)
            if not as_area:
                stop_lists = [m[2] for m in metas]
                counts = np.array([len(s) for s in stop_lists], dtype=np.int64)
                flat_ids = (
                    np.concatenate([np.asarray(s, dtype=np.int64) for s in stop_lists])
                    if counts.sum()
                    else np.empty(0, np.int64)
                )
                ok, lats, lons, tags_list = self.nodes.stops_bulk(flat_ids)
                stops_col = []
                pos = 0
                fi = 0
                for c in counts:
                    stops = []
                    for j in range(pos, pos + int(c)):
                        if ok[j]:
                            stops.append(
                                {
                                    "id": int(flat_ids[j]),
                                    "lat": float(lats[fi]),
                                    "lon": float(lons[fi]),
                                    "tags": tags_list[fi],
                                }
                            )
                            fi += 1
                    stops_col.append(stops)
                    pos += int(c)
                # Typed conversion is load-bearing: raw python lists make
                # pyarrow infer list<struct<..., tags: list<list<string>>>>
                # (and list<null> for an all-empty batch), diverging from
                # PT_SCHEMA and risking cross-block unification failures.
                cols["stops"] = pa.array(stops_col, pa.list_(STOP_T))
            cols["geometry"] = geom
            cols["status_code"] = batch["status_code"]
            cols["status_detail"] = batch["status_detail"]
            order = (AREA_SCHEMA if as_area else PT_SCHEMA).names
            return pa.table({k: cols[k] for k in order})

    return with_meta.map_batches(
        FinishMeta,
        batch_format="pyarrow",
        concurrency=default_actor_concurrency(),
    )
