"""Element tables: the Ray-Data-native equivalent of the reference's
3-pass ``Parser::new`` cache build (reference mod.rs:173-507).

The reference scans the same PBF file three times (relations → ways →
nodes), sharing ``Arc<RwLock<HashSet>>`` id-sets between passes. Here the
page corpus is scanned ONCE into a unified element Dataset; the id-sets
become small broadcast side-inputs (``ray.put`` of sorted int64 arrays,
``np.isin``/searchsorted filters inside ``map_batches``) — the
semi-joins J1/J2 of SURVEY.md §2.4. At 10^12-page scale the extracted
element table is checkpointed to partitioned Parquet instead of being
re-derived per consumer (``ingest_elements``).

Fidelity notes vs the reference:
* relations with zero way members are dropped (F8, mod.rs:253-257)
* member ways get an EMPTY info map when used for assembly (F9, mod.rs:337)
* standalone filter-matching ways with zero nodes are dropped (F10,
  mod.rs:380-388)
* member partition is ROLE-BLIND (F7, mod.rs:242-252): every node member is
  a stop, every way member is route geometry (platforms included)
* a way can be BOTH a relation member and a standalone filter match — the
  reference stores it in both caches; we keep one row with two flags
* duplicate ids across pages: nodes and member-ways dedup by id (last-wins
  HashMap semantics, mod.rs:422/494 — any-wins here since payloads are
  identical); relations and standalone ways are NOT deduped (Vec extend)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..kernel.filters import TagFilter
from ..sources.extract import OsmPayloadExtractor, extract_batch


def read_pages(
    path: str, validate: bool = True, include_url: bool = False, **read_kwargs
) -> rd.Dataset:
    """Read the pages corpus with column pruning (only what extraction needs).

    ``validate=False`` skips the ``text`` column entirely (~40% of the
    corpus bytes) — the byte-identical invariant is enforced by the test
    suite and the correctness-gate queries, not by every production run.

    ``override_num_blocks`` defaults to 4× the CPU count: downstream
    map_batches parallelism equals the BLOCK count, and a small single-file
    corpus would otherwise read as one block and serialize the whole
    extraction stage onto one worker. (At 100 TB the input is many files and
    the default block sizing is already right — pass
    ``override_num_blocks=None`` through ``read_kwargs`` to disable.)
    """
    columns = ["html"]
    if validate:
        columns = ["url", "html", "text"]
    elif include_url:
        columns = ["url", "html"]
    if "override_num_blocks" not in read_kwargs:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        read_kwargs["override_num_blocks"] = 2 * cpus
    if read_kwargs.get("override_num_blocks") is None:
        read_kwargs.pop("override_num_blocks")
    return rd.read_parquet(path, columns=columns, **read_kwargs)


def read_pages_jsonl(path: str, validate: bool = True) -> rd.Dataset:
    """Read a JSONL page corpus (url, warc_ts iso, html_b64, text, lang) and
    decode to the standard pages schema — the alternate source format."""
    ds = rd.read_json(path)

    def decode(batch: pa.Table) -> pa.Table:
        import base64

        htmls = [base64.b64decode(h) for h in batch["html_b64"].to_pylist()]
        cols = {
            "url": batch["url"],
            "html": pa.array(htmls, pa.binary()),
        }
        if validate and "text" in batch.column_names:
            cols["text"] = batch["text"]
        return pa.table(cols)

    return ds.map_batches(decode, batch_format="pyarrow")


def extract_elements(
    pages: rd.Dataset,
    *,
    include_url: bool = False,
    validate: bool = True,
    batch_size: int = 1024,
    concurrency: Optional[int | tuple[int, int]] = None,
) -> rd.Dataset:
    """pages → unified element rows.

    Stateless tasks with per-worker-process extractor caching (see
    sources.extract.extract_batch) — actor-pool dispatch overhead would
    cap throughput here; pass ``concurrency`` to force an actor pool when
    the extractor grows real per-actor state.

    ``batch_size`` default from the round-5 contention experiment
    (interleaved A/B, 13.8M elements / 32 cpus, medians of 3): 64 →
    6.77 s, 256 → 5.22 s, 1024 → 4.40 s, 4096 → 5.81 s. Bigger batches
    win until task count drops below what load-balancing needs — the
    "smaller read batches parse hot-in-cache" hypothesis (NOTES_ROUND4
    #1) is REFUTED at this scale; dispatch overhead dominates cache
    effects.
    """
    if concurrency is not None:
        return pages.map_batches(
            OsmPayloadExtractor,
            fn_constructor_kwargs={"include_url": include_url, "validate": validate},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return pages.map_batches(
        partial(extract_batch, include_url=include_url, validate=validate),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def _project_relations(batch: pa.Table, filters: str) -> pa.Table:
    """kind=relation rows → RelationData projection (F5/F7/F8) with DSL
    filter (F1). Stateless task fn — TagFilter compile is trivial."""
    batch = batch.filter(pc.equal(batch["kind"], "relation"))
    if batch.num_rows == 0:
        return _empty_relations_table()
    mask = TagFilter(filters).mask_table(batch, "tags")
    batch = batch.filter(pa.array(mask))
    if batch.num_rows == 0:
        return _empty_relations_table()
    # role-blind member partition (F7), vectorized via Arrow offsets —
    # round-3: the old per-relation Python loop over to_pylist members was
    # 0.28 s/1M-element batch, ~50% of this stage's wall time
    n = batch.num_rows
    refs_col = batch["member_refs"].combine_chunks()
    types_col = batch["member_types"].combine_chunks()
    offs = np.asarray(refs_col.offsets, np.int64)
    offs = offs - offs[0]
    flat_refs = refs_col.flatten().to_numpy(zero_copy_only=False)
    flat_types = types_col.flatten().to_numpy(zero_copy_only=False)
    rel_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))

    def _partition(kind_code: int) -> pa.ListArray:
        m = flat_types == kind_code
        counts = np.bincount(rel_of[m], minlength=n)
        loffs = np.zeros(n + 1, np.int32)
        np.cumsum(counts, out=loffs[1:])
        return pa.ListArray.from_arrays(
            pa.array(loffs, pa.int32()),
            pa.array(flat_refs[m], pa.int64()),
        )

    out = pa.table(
        {
            "id": batch["id"],
            "tags": batch["tags"],
            "info": batch["info"],
            "way_ids": _partition(1),
            "stop_ids": _partition(0),
        }
    )
    # F8: drop relations without way members
    keep = pc.greater(pc.list_value_length(out["way_ids"]), 0)
    return out.combine_chunks().filter(keep)


def _empty_relations_table() -> pa.Table:
    return pa.table(
        {
            "id": pa.array([], pa.int64()),
            "tags": pa.array([], pa.map_(pa.string(), pa.string())),
            "info": pa.array([], pa.map_(pa.string(), pa.string())),
            "way_ids": pa.array([], pa.list_(pa.int64())),
            "stop_ids": pa.array([], pa.list_(pa.int64())),
        }
    )


def _project_ways(batch: pa.Table, way_ids_ref, filters: str) -> pa.Table:
    """kind=way rows → way projection with is_member / is_standalone flags.

    ``way_ids_ref`` is a ray.put of the SORTED member-way id array
    (broadcast semi-join J1): ray.get inside the task hits the local
    plasma copy after the first fetch per node. Standalone selection
    applies the DSL filter (F2) and drops zero-node ways (F10).
    """
    batch = batch.filter(pc.equal(batch["kind"], "way"))
    way_ids = ray.get(way_ids_ref) if way_ids_ref is not None else np.empty(0, np.int64)
    ids = batch["id"].to_numpy(zero_copy_only=False)
    is_member = _isin_sorted(ids, way_ids)
    matches = TagFilter(filters).mask_table(batch, "tags")
    n_nodes = pc.list_value_length(batch["node_refs"]).to_numpy(zero_copy_only=False)
    is_standalone = matches & (n_nodes > 0)
    keep = is_member | is_standalone
    out = pa.table(
        {
            "id": batch["id"],
            "tags": batch["tags"],
            "info": batch["info"],
            "node_refs": batch["node_refs"],
            "is_member": pa.array(is_member),
            "is_standalone": pa.array(is_standalone),
        }
    )
    return out.combine_chunks().filter(pa.array(keep))


def _project_nodes(batch: pa.Table, node_ids_ref) -> pa.Table:
    """kind=node rows ⋉ referenced-node-ids (broadcast semi-join J2).

    ``node_ids_ref``: a ray.put ref of a sorted int64 array, or a
    ShardedIdSet (round-3 default — the set is built and merged entirely
    in Ray tasks, never serialized through the driver)."""
    batch = batch.filter(pc.equal(batch["kind"], "node"))
    ids = batch["id"].to_numpy(zero_copy_only=False)
    if node_ids_ref is None:
        keep = np.zeros(len(ids), dtype=bool)
    elif isinstance(node_ids_ref, ShardedIdSet):
        keep = _isin_idset(ids, node_ids_ref)
    else:
        keep = _isin_sorted(ids, ray.get(node_ids_ref))
    out = pa.table(
        {
            "id": batch["id"],
            "lat": batch["lat"],
            "lon": batch["lon"],
            "tags": batch["tags"],
        }
    )
    return out.combine_chunks().filter(pa.array(keep))


def _isin_sorted(values: np.ndarray, sorted_haystack: np.ndarray) -> np.ndarray:
    """Vectorized membership against a sorted int64 array (binary search)."""
    if len(sorted_haystack) == 0:
        return np.zeros(len(values), dtype=bool)
    idx = np.searchsorted(sorted_haystack, values)
    idx[idx >= len(sorted_haystack)] = len(sorted_haystack) - 1
    return sorted_haystack[idx] == values


# ---------------------------------------------------------------------------
# sharded broadcast id-sets (round-3): the big semi-join side built and
# merged entirely in Ray tasks — the driver-side concat + np.unique over
# ~10^7 ids was a measured ~2 s SERIAL gap on the flagship critical path
# (identical at every CPU count, so it taxed the scaling ratio exactly
# where it hurts). Shape mirrors assemble.build_node_index_sharded.
# ---------------------------------------------------------------------------

_IDSET_PRIME = np.uint64(0x9E3779B97F4A7C15)


@dataclass
class ShardedIdSet:
    """P sorted int64 shards in the object store, hash-bucketed by value;
    the driver holds only the refs."""

    shard_refs: list
    P: int


def _idset_bucket(ids: np.ndarray, P: int) -> np.ndarray:
    return (
        (np.ascontiguousarray(ids, dtype=np.int64).view(np.uint64) * _IDSET_PRIME)
        % np.uint64(P)
    ).astype(np.int64)


def _split_idset_block(block: pa.Table, columns: list, P: int):
    """One materialized block → P sorted-unique id piece arrays.

    Missing columns contribute nothing: Ray's map operator emits a
    COLUMNLESS ``()`` empty block when a pyarrow UDF returns zero rows
    (observed on kind-narrow PBF sources, round-5 fix — the r4 driver's
    ``ptv2_from_pbf``/``pbf_roundtrip`` crash), so ``block[col]`` must not
    be assumed present on empty blocks."""
    parts = []
    for col in columns:
        if col not in block.schema.names:
            continue  # columnless/narrow empty block (see docstring)
        c = block[col].combine_chunks()
        parts.append(c.flatten().to_numpy(zero_copy_only=False).astype(np.int64))
    vals = (
        np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    )
    b = _idset_bucket(vals, P)
    # selecting from a sorted array by mask preserves order — no re-sort
    return tuple(vals[b == p] for p in range(P))


def _merge_idset_shard(*pieces):
    arrs = [p for p in pieces if len(p)]
    if not arrs:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(arrs))


def build_sharded_id_set(
    ds: rd.Dataset,
    columns: list,
    extra_ids: Optional[np.ndarray] = None,
    num_shards: Optional[int] = None,
) -> ShardedIdSet:
    """Distinct values of list<int64> ``columns`` over a MATERIALIZED
    dataset, as a ShardedIdSet. Split tasks read block refs directly (no
    extra Dataset pass); per-bucket merge tasks produce the shards; the
    driver never touches id data."""
    if num_shards is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_shards = int(max(2, min(16, cpus)))
    P = num_shards
    split = ray.remote(_split_idset_block)
    merge = ray.remote(_merge_idset_shard)
    block_refs = []
    for bundle in ds.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
    piece_refs = [
        split.options(num_returns=P).remote(bref, columns, P) for bref in block_refs
    ]
    extra_pieces = []
    if extra_ids is not None and len(extra_ids):
        ex = np.unique(np.asarray(extra_ids, dtype=np.int64))
        eb = _idset_bucket(ex, P)
        extra_pieces = [ray.put(ex[eb == p]) for p in range(P)]
    shard_refs = [
        merge.remote(
            *([piece_refs[i][p] for i in range(len(piece_refs))]
              + ([extra_pieces[p]] if extra_pieces else []))
        )
        for p in range(P)
    ]
    return ShardedIdSet(shard_refs, P)


def _isin_idset(values: np.ndarray, idset) -> np.ndarray:
    """Membership of int64 values in a broadcast id-set: legacy sorted
    array (one searchsorted) or ShardedIdSet (bucketed searchsorted —
    same O(log n) per value, shards fetched once per worker process)."""
    from ..util import cached_get

    if not isinstance(idset, ShardedIdSet):
        return _isin_sorted(values, idset)
    out = np.zeros(len(values), dtype=bool)
    if not len(values):
        return out
    b = _idset_bucket(values, idset.P)
    for p in range(idset.P):
        m = b == p
        if m.any():
            out[m] = _isin_sorted(values[m], cached_get(idset.shard_refs[p]))
    return out


def dedup_by_id(ds: rd.Dataset, num_partitions: int = 0) -> rd.Dataset:
    """Exact dedup by ``id`` — distributed realization of the reference's
    last-wins HashMap merge (mod.rs:422, 494); with identical duplicate
    payloads any-wins == last-wins.

    Round-3 rewrite (VERDICT r2 #3): the old ``map_groups(head(1))`` paid
    one pandas UDF call per unique id. New plan, mirroring ``exact_dedup``
    (aggregate, never per-group UDFs) while keeping the nested payload
    columns OUT of every shuffle (Acero rejects map/list non-key fields):

    1. per-batch LOCAL first-wins (vectorized ``np.unique`` take) — kills
       within-batch copies and tags each survivor with a unique uint64,
    2. groupby-AGGREGATE ``Min(tag)``+``Count`` over the (id, tag) pairs
       only — payloads stay put,
    3. the (id, winner-tag) pairs of DUPLICATE-BEARING ids (Count > 1) are
       broadcast as two sorted arrays; the final vectorized filter keeps a
       row unless its id is duplicate-bearing and its tag lost.

    Broadcast contract: driver/plasma holds O(#ids that actually have
    cross-batch duplicates) — the duplicate volume, not the corpus.
    """
    from ray.data.aggregate import Count, Min

    from ..util import cached_get

    def local_first_wins(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        _, first_idx = np.unique(ids, return_index=True)
        first_idx.sort()  # preserve batch order
        batch = batch.combine_chunks().take(pa.array(first_idx, pa.int64()))
        # unique survivor tag: 64 random bits per row (collision over the
        # whole corpus ≈ birthday(2^64) — negligible; a collision could
        # only duplicate-keep one row, never lose one, and duplicate
        # payloads are identical anyway)
        import os as _os

        rng = np.random.default_rng(int.from_bytes(_os.urandom(8), "little"))
        tags = rng.integers(0, 1 << 62, size=batch.num_rows, dtype=np.int64)
        return batch.append_column("__tag", pa.array(tags, pa.int64()))

    tagged = ds.map_batches(local_first_wins, batch_format="pyarrow").materialize()

    winners = (
        tagged.map_batches(
            lambda t: t.select(["id", "__tag"]), batch_format="pyarrow"
        )
        .groupby("id")
        .aggregate(Min("__tag", alias_name="__w"), Count(alias_name="__n"))
        .map_batches(
            lambda t: t.filter(pa.compute.greater(t["__n"], 1)).select(
                ["id", "__w"]
            ),
            batch_format="pyarrow",
        )
    )
    id_parts, w_parts = [], []
    for b in winners.iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        id_parts.append(b["id"].to_numpy(zero_copy_only=False).astype(np.int64))
        w_parts.append(b["__w"].to_numpy(zero_copy_only=False).astype(np.int64))
    dup_ids = np.concatenate(id_parts) if id_parts else np.empty(0, np.int64)
    dup_w = np.concatenate(w_parts) if w_parts else np.empty(0, np.int64)
    order = np.argsort(dup_ids, kind="stable")
    winners_ref = ray.put((dup_ids[order], dup_w[order]))

    def keep_winners(batch: pa.Table) -> pa.Table:
        dids, dw = cached_get(winners_ref)
        ids = batch["id"].to_numpy(zero_copy_only=False)
        tags = batch["__tag"].to_numpy(zero_copy_only=False)
        if len(dids):
            idx = np.searchsorted(dids, ids)
            idx_c = np.minimum(idx, len(dids) - 1)
            is_dup = dids[idx_c] == ids
            keep = ~is_dup | (tags == dw[idx_c])
        else:
            keep = np.ones(len(ids), bool)
        return batch.combine_chunks().filter(pa.array(keep)).drop_columns(["__tag"])

    return tagged.map_batches(keep_winners, batch_format="pyarrow")


@dataclass
class ParserTables:
    """The reference ``Parser`` cache as three Ray Datasets.

    relations: id, tags, info, way_ids (ordered), stop_ids (ordered)
    ways:      id, tags, info, node_refs, is_member, is_standalone
    nodes:     id, lat, lon, tags  (semi-joined to referenced ids)
    """

    relations: rd.Dataset
    ways: rd.Dataset
    nodes: rd.Dataset


_SPLIT_COLS = {
    "relation": ["kind", "id", "tags", "info", "member_refs", "member_types"],
    "way": ["kind", "id", "tags", "info", "node_refs"],
    "node": ["kind", "id", "lat", "lon", "tags"],
}


def _split_elements_by_kind(
    elements: rd.Dataset,
) -> tuple[rd.Dataset, rd.Dataset, rd.Dataset]:
    """ONE streaming pass over the elements blocks → three kind-split,
    column-pruned datasets (relations / ways / nodes raw rows).

    Raw Ray tasks (the Dataset API has no multi-output map — the
    documented last-resort case): ``iter_internal_ref_bundles`` yields
    block refs AS EXTRACTION PRODUCES THEM, so the split overlaps the
    extraction stage, and the full elements table is never pinned — only
    the three narrower kind projections are (round-4; replaces the
    materialize-elements-then-scan-3× plan, VERDICT r3 #8).
    """

    @ray.remote(num_returns=3)
    def split(block):
        from ..sources.osmxml import ELEMENT_SCHEMA

        t = (
            block
            if isinstance(block, pa.Table)
            else pa.Table.from_pandas(block, preserve_index=False)
        )
        out = []
        for kind, cols in _SPLIT_COLS.items():
            part = t.filter(pc.equal(t["kind"], kind))
            # schema-ful output even when the source block is kind-narrow
            # (round-5: a column the block doesn't carry is null-filled at
            # its canonical ELEMENT_SCHEMA type, never silently dropped)
            data = {
                c: part[c]
                if c in part.schema.names
                else pa.nulls(part.num_rows, ELEMENT_SCHEMA.field(c).type)
                for c in cols
            }
            out.append(pa.table(data))
        return tuple(out)

    rel_refs, way_refs, node_refs = [], [], []
    for bundle in elements.iter_internal_ref_bundles():
        for ref, _md in bundle.blocks:
            a, b, c = split.remote(ref)
            rel_refs.append(a)
            way_refs.append(b)
            node_refs.append(c)
    return (
        rd.from_arrow_refs(rel_refs),
        rd.from_arrow_refs(way_refs),
        rd.from_arrow_refs(node_refs),
    )


def build_parser_tables(
    elements: rd.Dataset,
    filters: str,
    *,
    dedup: bool = False,
    materialize: bool = True,
    id_set_mode: str = "exact",
    bloom_fpr: float = 0.01,
    plan: str = "auto",
) -> ParserTables:
    """elements Dataset → ParserTables (one upstream scan, broadcast semi-joins).

    ``plan="split"`` (round-4): one streaming kind-split pass over the
    extraction blocks (overlapped with extraction itself) feeds three
    column-pruned datasets; each projection then scans ONLY its own kind's
    rows, and the full elements table is never pinned. ``plan="scan3"``
    keeps the round-3 shape — materialize elements once, scan it three
    times (relations/ways/nodes) — and remains the shape ``ingest_elements``
    parquet corpora use with ``materialize=False`` (re-reading parquet
    three times instead of pinning). ``plan="auto"`` (default) picks by
    cluster size — measured at 2000 replicas: split wins ~8% at 32 cpus
    (overlap + narrower later scans), ties at 8, loses ~10% at 2 (the
    split pass is pure extra CPU when nothing can overlap), so auto uses
    split at ≥16 CPUs. On a multi-node cluster split additionally avoids
    pinning the full elements table in the object store.

    ``id_set_mode``:
    * ``"exact"`` (default) — the member-way / referenced-node id sets are
      broadcast as sorted int64 arrays (8 B/key): right up to the point a
      10^10-key side outgrows ``ray.put``.
    * ``"bloom"`` — the at-scale fallback (round-3, VERDICT r2 #6): the id
      sets stay DISTRIBUTED (distinct-id datasets); each projection runs a
      broadcast Bloom prefilter (~1.2 B/key at fpr=1%, built by OR-merging
      per-partition partial filters) followed by an EXACT hash semi-join of
      the (bloom-shrunk) survivors against the distinct-id table — same
      ParserTables as "exact" (forced-parity tested), with the big
      broadcast replaced by a small filter + a join whose left side is
      ~matches + fpr·corpus instead of the whole corpus.
    """
    if id_set_mode not in ("exact", "bloom"):
        raise ValueError(f"id_set_mode must be 'exact' or 'bloom', got {id_set_mode!r}")
    if plan not in ("auto", "split", "scan3"):
        raise ValueError(f"plan must be 'auto', 'split' or 'scan3', got {plan!r}")
    if plan == "split" and id_set_mode == "bloom":
        # an EXPLICIT split request must not silently materialize the
        # full elements table (the split plan exists precisely to avoid
        # pinning it); the bloom ingest path is scan3-shaped only
        raise ValueError(
            "plan='split' does not support id_set_mode='bloom' — use "
            "plan='scan3' (or 'auto', which resolves to scan3 for bloom)"
        )
    if plan == "auto":
        cpus = int(ray.cluster_resources().get("CPU", 4))
        plan = "split" if cpus >= 16 and id_set_mode == "exact" else "scan3"
    if plan == "split":
        return _build_parser_tables_split(elements, filters, dedup=dedup)
    if materialize:
        elements = elements.materialize()
    if id_set_mode == "bloom":
        return _build_parser_tables_bloom(
            elements, filters, dedup=dedup, fpr=bloom_fpr
        )

    relations = elements.map_batches(
        partial(_project_relations, filters=filters), batch_format="pyarrow"
    )
    # NOTE: relations are NOT deduped even when dedup=True — the reference
    # extends a Vec (duplicate relation ids appear twice, mod.rs:293)
    # Coalesce: the filtered head table inherits the extraction stage's
    # many near-empty blocks; per-task overhead on hundreds of tiny blocks
    # dominates otherwise. 2 blocks per CPU (not 1): the assembly stage's
    # per-relation flatten cost is skewed, and a barrier over one-per-CPU
    # blocks waits on the slowest straggler.
    cpus = int(ray.cluster_resources().get("CPU", 4))
    relations = relations.repartition(max(4, 2 * cpus)).materialize()

    # broadcast side 1: member way ids (+ stop ids for the node pass)
    way_id_arr, stop_id_arr = _flatten_unique_list_columns(
        relations, ["way_ids", "stop_ids"]
    )
    way_ids_ref = ray.put(way_id_arr)

    ways = elements.map_batches(
        partial(_project_ways, way_ids_ref=way_ids_ref, filters=filters),
        batch_format="pyarrow",
    )
    if dedup:
        ways = dedup_by_id(ways)
    ways = ways.materialize()  # ids + refs of matched ways: small vs corpus

    # broadcast side 2: referenced node ids = way refs ∪ stop ids.
    # Built as a ShardedIdSet entirely in Ray tasks (round-3): the driver
    # concat+np.unique over ~10^7 ids was a ~2 s serial critical-path gap.
    node_id_set = build_sharded_id_set(ways, ["node_refs"], extra_ids=stop_id_arr)

    nodes = elements.map_batches(
        partial(_project_nodes, node_ids_ref=node_id_set), batch_format="pyarrow"
    )
    if dedup:
        nodes = dedup_by_id(nodes)

    return ParserTables(relations=relations, ways=ways, nodes=nodes.materialize())


def _build_parser_tables_split(
    elements: rd.Dataset, filters: str, *, dedup: bool = False
) -> ParserTables:
    """The fused physical plan (round-4): kind-split once (overlapping
    extraction), then each projection scans only its own kind's
    column-pruned rows. Output tables are identical to the scan3 plan
    (forced-parity tested) — the projections re-apply their kind filter,
    which is a no-op on the pre-split input."""
    rel_raw, way_raw, node_raw = _split_elements_by_kind(elements)
    return _parser_tables_from_split(rel_raw, way_raw, node_raw, filters, dedup=dedup)


def _parser_tables_from_split(
    rel_raw: rd.Dataset,
    way_raw: rd.Dataset,
    node_raw: rd.Dataset,
    filters: str,
    *,
    dedup: bool = False,
) -> ParserTables:
    """Shared tail of the split plans: three kind-pre-filtered raw
    datasets → ParserTables (projections re-apply their kind filter — a
    no-op on pre-split input)."""
    relations = rel_raw.map_batches(
        partial(_project_relations, filters=filters), batch_format="pyarrow"
    )
    # Coalesce as in scan3: the filtered head table inherits many
    # near-empty blocks; 2 blocks per CPU (see scan3 NOTE on stragglers).
    cpus = int(ray.cluster_resources().get("CPU", 4))
    relations = relations.repartition(max(4, 2 * cpus)).materialize()

    way_id_arr, stop_id_arr = _flatten_unique_list_columns(
        relations, ["way_ids", "stop_ids"]
    )
    way_ids_ref = ray.put(way_id_arr)

    ways = way_raw.map_batches(
        partial(_project_ways, way_ids_ref=way_ids_ref, filters=filters),
        batch_format="pyarrow",
    )
    if dedup:
        ways = dedup_by_id(ways)
    ways = ways.materialize()

    node_id_set = build_sharded_id_set(ways, ["node_refs"], extra_ids=stop_id_arr)

    nodes = node_raw.map_batches(
        partial(_project_nodes, node_ids_ref=node_id_set), batch_format="pyarrow"
    )
    if dedup:
        nodes = dedup_by_id(nodes)

    return ParserTables(relations=relations, ways=ways, nodes=nodes.materialize())


def _distinct_list_ids(ds: rd.Dataset, column: str) -> rd.Dataset:
    """DISTRIBUTED distinct values of a list<int64> column → Dataset {"id"}.

    The at-scale twin of ``_flatten_unique_list_column``: per-batch local
    flatten+unique (combiner) → groupby-distinct shuffle; the id set never
    touches the driver."""
    from ray.data.aggregate import Count

    def local(batch: pa.Table) -> pa.Table:
        col = batch[column].combine_chunks()
        a = np.unique(col.flatten().to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"id": pa.array(a, pa.int64())})

    return (
        ds.select_columns([column])
        .map_batches(local, batch_format="pyarrow")
        .groupby("id")
        .aggregate(Count(alias_name="__n"))
        .map_batches(lambda t: t.select(["id"]), batch_format="pyarrow")
    )


def _bloom_from_id_dataset(ids: rd.Dataset, n: int, fpr: float):
    """BloomFilter over a distributed {"id"} dataset: per-partition partial
    filters with SHARED (n_bits, k) parameters, OR-merged on the driver —
    driver memory = one filter (~1.2 B/key), never the key set itself."""
    import math

    from .bloom import BloomFilter

    n = max(1, n)
    n_bits = max(64, int(-n * math.log(fpr) / (math.log(2) ** 2)))
    n_bits = ((n_bits + 63) // 64) * 64
    k = max(1, round(n_bits / n * math.log(2)))

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bf = BloomFilter(np.zeros(n_bits // 64, dtype=np.uint64), n_bits, k)
        from .bloom import _hash2

        h1, h2 = _hash2(keys)
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
            np.bitwise_or.at(
                bf.bits,
                (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        return pa.table({"bits": pa.array([bf.bits.tobytes()], pa.binary())})

    merged = np.zeros(n_bits // 64, dtype=np.uint64)
    for b in ids.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=16, batch_format="pyarrow"
    ):
        for raw in b["bits"].to_pylist():
            merged |= np.frombuffer(raw, np.uint64)
    return BloomFilter(merged, n_bits, k)


def _heal_blocks(ds: rd.Dataset, rows: int, max_blocks: int) -> rd.Dataset:
    """Repartition a (materialized, possibly sparse) dataset so every block
    is schema-ful — groupby aggregators emit zero-COLUMN empty blocks that
    bypass map_batches and crash Acero joins (NOTES_ROUND2 rule)."""
    return ds.repartition(max(1, min(max_blocks, rows)))


def _bloom_false_positive_ids(
    candidate_ids: rd.Dataset, true_ids: rd.Dataset, n_true: int
) -> np.ndarray:
    """SORTED array of candidate ids that are NOT true ids — the Bloom
    false-positive set, resolved by an ID-ONLY anti-join (left-outer +
    null-marker filter; Acero forbids nested payload columns in joins, so
    payload rows never cross a shuffle here). Expected size is
    fpr × |distinct corpus ids| — small enough to broadcast by design;
    the payload filter then subtracts it exactly."""
    from ..util import JOIN_AGG_ARGS, join_partitions

    # both join sides descend from groupby aggregators — heal both;
    # partition count sized to the bigger side (round-5: a fixture-sized
    # join needs 2 aggregator actors, not 8 — spin-up dominated the gate)
    candidate_ids = candidate_ids.materialize()
    n_cand = candidate_ids.count()
    npart = join_partitions(rows=max(n_cand, n_true))
    candidate_ids = _heal_blocks(candidate_ids, n_cand, npart)
    marker = true_ids.map_batches(
        lambda t: t.append_column(
            "__m", pa.array(np.ones(t.num_rows, np.int8), pa.int8())
        ),
        batch_format="pyarrow",
    )
    marker = _heal_blocks(marker, n_true, npart)
    joined = candidate_ids.join(
        marker,
        join_type="left_outer",
        num_partitions=npart,
        on=("id",),
        aggregator_ray_remote_args=JOIN_AGG_ARGS,
    )
    fp = joined.map_batches(
        lambda t: t.filter(pc.is_null(t["__m"])).select(["id"]),
        batch_format="pyarrow",
    )
    parts = [
        b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        for b in fp.iter_batches(batch_size=1 << 18, batch_format="pyarrow")
    ]
    flat = np.concatenate(parts) if parts else np.empty(0, np.int64)
    return np.sort(flat)


def _build_parser_tables_bloom(
    elements: rd.Dataset, filters: str, *, dedup: bool, fpr: float
) -> ParserTables:
    """The id_set_mode="bloom" realization of ``build_parser_tables``.

    Plan per semi-join (J1 member ways, J2 referenced nodes):
    1. distinct true-id dataset stays DISTRIBUTED (never on the driver),
    2. Bloom filter built by OR-merging per-partition partials (driver
       holds ~1.2 B/key — the broadcastable summary),
    3. corpus projection keeps bloom-passing rows (≈ matches + fpr·rest),
    4. the bloom FALSE POSITIVES are resolved exactly by an id-only
       anti-join of distinct candidate ids vs true ids, broadcast
       (fpr-sized) and subtracted — payload (map/list) columns never
       enter a join, and the output tables are bit-identical to the
       exact path (forced-parity tested).
    """
    from ray.data.aggregate import Count

    from ..util import cached_get

    relations = elements.map_batches(
        partial(_project_relations, filters=filters), batch_format="pyarrow"
    )
    cpus = int(ray.cluster_resources().get("CPU", 4))
    relations = relations.repartition(max(4, 2 * cpus)).materialize()

    # --- ways: bloom prefilter, then exact FP subtraction -----------------
    way_ids = _distinct_list_ids(relations, "way_ids").materialize()
    n_way_ids = way_ids.count()
    way_bloom_ref = ray.put(_bloom_from_id_dataset(way_ids, n_way_ids, fpr))

    def project_ways_bloom(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["kind"], "way"))
        bf = cached_get(way_bloom_ref)
        ids = batch["id"].to_numpy(zero_copy_only=False)
        maybe_member = bf.contains(ids) if len(ids) else np.zeros(0, bool)
        matches = TagFilter(filters).mask_table(batch, "tags")
        n_nodes = pc.list_value_length(batch["node_refs"]).to_numpy(
            zero_copy_only=False
        )
        is_standalone = matches & (n_nodes > 0)
        keep = maybe_member | is_standalone
        out = pa.table(
            {
                "id": batch["id"],
                "tags": batch["tags"],
                "info": batch["info"],
                "node_refs": batch["node_refs"],
                "maybe_member": pa.array(maybe_member),
                "is_standalone": pa.array(is_standalone),
            }
        )
        return out.combine_chunks().filter(pa.array(keep))

    candidates = elements.map_batches(
        project_ways_bloom, batch_format="pyarrow"
    ).materialize()  # consumed twice: FP resolution + final filter

    cand_ids = (
        candidates.map_batches(
            lambda t: pa.table(
                {
                    "id": pa.array(
                        np.unique(
                            t.filter(t["maybe_member"])["id"].to_numpy(
                                zero_copy_only=False
                            )
                        ),
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("id")
        .aggregate(Count(alias_name="__n"))
        .map_batches(lambda t: t.select(["id"]), batch_format="pyarrow")
    )
    way_fp_ref = ray.put(_bloom_false_positive_ids(cand_ids, way_ids, n_way_ids))

    def finalize_ways(batch: pa.Table) -> pa.Table:
        fp = cached_get(way_fp_ref)
        ids = batch["id"].to_numpy(zero_copy_only=False)
        maybe = batch["maybe_member"].to_numpy(zero_copy_only=False)
        is_member = maybe & ~_isin_sorted(ids, fp)
        is_standalone = batch["is_standalone"].to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                "id": batch["id"],
                "tags": batch["tags"],
                "info": batch["info"],
                "node_refs": batch["node_refs"],
                "is_member": pa.array(is_member),
                "is_standalone": batch["is_standalone"],
            }
        )
        return out.combine_chunks().filter(pa.array(is_member | is_standalone))

    ways = candidates.map_batches(finalize_ways, batch_format="pyarrow")
    if dedup:
        ways = dedup_by_id(ways)
    ways = ways.materialize()

    # --- nodes: bloom prefilter + exact FP subtraction --------------------
    ref_ids = _distinct_list_ids(ways, "node_refs")
    stop_ids = _distinct_list_ids(relations, "stop_ids")
    node_ids = (
        ref_ids.union(stop_ids)
        .groupby("id")
        .aggregate(Count(alias_name="__n"))
        .map_batches(lambda t: t.select(["id"]), batch_format="pyarrow")
        .materialize()
    )
    n_node_ids = node_ids.count()
    node_bloom_ref = ray.put(_bloom_from_id_dataset(node_ids, n_node_ids, fpr))

    def project_nodes_bloom(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["kind"], "node"))
        bf = cached_get(node_bloom_ref)
        ids = batch["id"].to_numpy(zero_copy_only=False)
        keep = bf.contains(ids) if len(ids) else np.zeros(0, bool)
        out = pa.table(
            {
                "id": batch["id"],
                "lat": batch["lat"],
                "lon": batch["lon"],
                "tags": batch["tags"],
            }
        )
        return out.combine_chunks().filter(pa.array(keep))

    node_candidates = elements.map_batches(
        project_nodes_bloom, batch_format="pyarrow"
    ).materialize()
    node_cand_ids = (
        node_candidates.map_batches(
            lambda t: pa.table(
                {
                    "id": pa.array(
                        np.unique(t["id"].to_numpy(zero_copy_only=False)), pa.int64()
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("id")
        .aggregate(Count(alias_name="__n"))
        .map_batches(lambda t: t.select(["id"]), batch_format="pyarrow")
    )
    node_fp_ref = ray.put(
        _bloom_false_positive_ids(node_cand_ids, node_ids, n_node_ids)
    )

    def finalize_nodes(batch: pa.Table) -> pa.Table:
        fp = cached_get(node_fp_ref)
        ids = batch["id"].to_numpy(zero_copy_only=False)
        keep = ~_isin_sorted(ids, fp)
        return batch.combine_chunks().filter(pa.array(keep))

    nodes = node_candidates.map_batches(finalize_nodes, batch_format="pyarrow")
    if dedup:
        nodes = dedup_by_id(nodes)

    return ParserTables(relations=relations, ways=ways, nodes=nodes.materialize())


def _flatten_unique_list_columns(ds: rd.Dataset, columns: list) -> list:
    """SORTED-UNIQUE flat values of SEVERAL list<int64> columns in ONE
    dataset execution (each execution pays ~0.1-0.3 s of streaming-
    executor startup at any CPU count — pure serial floor; round-3 fused
    the way_ids/stop_ids passes). The flatten + per-block dedup runs
    DISTRIBUTED (map tasks emit packed blobs of each block's sorted-
    unique values); the driver only concatenates deduped parts."""

    def blob(batch: pa.Table) -> pa.Table:
        out = {}
        for col in columns:
            c = batch[col].combine_chunks()
            a = np.unique(c.flatten().to_numpy(zero_copy_only=False).astype(np.int64))
            out[col] = pa.array([a.tobytes()], pa.binary())
        return pa.table(out)

    parts: dict = {c: [] for c in columns}
    for b in ds.select_columns(columns).map_batches(
        blob, batch_format="pyarrow", batch_size=1 << 18
    ).iter_batches(batch_size=64, batch_format="pyarrow"):
        for col in columns:
            for raw in b[col].to_pylist():
                if raw:
                    parts[col].append(np.frombuffer(raw, np.int64))
    return [
        np.unique(np.concatenate(parts[c])) if parts[c] else np.empty(0, np.int64)
        for c in columns
    ]


def ingest_elements(
    pages_path: str,
    out_dir: str,
    *,
    validate: bool = True,
    concurrency: Optional[int] = None,
) -> str:
    """One-pass page scan → element parquet (the at-scale checkpoint).

    Partitioned parquet output (one file per block) — a failed run can
    resume by skipping finished partitions (see state.checkpoint).
    """
    pages = read_pages(pages_path, validate=validate)
    elements = extract_elements(pages, include_url=True, validate=validate, concurrency=concurrency)
    elements.write_parquet(out_dir)
    return out_dir


__all__ = [
    "ParserTables",
    "build_parser_tables",
    "dedup_by_id",
    "extract_elements",
    "ingest_elements",
    "read_pages",
]


def parser_tables_from_elements_parquet(
    elements_dir: str, filters: str, *, dedup: bool = False
) -> ParserTables:
    """ParserTables straight from an ``ingest_elements`` /
    ``resumable_ingest`` parquet checkpoint — the at-scale path for
    corpora too large to pin in the object store (round-4 twin of
    ``plan="split"`` for disk-resident elements).

    Each of the three passes is its OWN ``read_parquet`` with the kind
    predicate pushed into the scan and ``columns=`` pruned to that kind's
    projection needs — relations read member columns only, ways read
    node_refs, nodes read lat/lon; nothing reads the full row. (Predicate
    pushdown prunes row groups only as far as the writer clustered
    ``kind``; the column pruning applies regardless.)
    """
    import pyarrow.dataset as pds

    def kind_read(kind: str) -> rd.Dataset:
        return rd.read_parquet(
            elements_dir,
            columns=_SPLIT_COLS[kind],
            filter=pds.field("kind") == kind,
        )

    return _parser_tables_from_split(
        kind_read("relation"),
        kind_read("way"),
        kind_read("node"),
        filters,
        dedup=dedup,
    )
