"""Driver contract for the graft builder (Ray Data target).

``entry()``      — flagship smoke: OSM pages → PT routes → spatial joins,
                   plus a quality-scoring pass over sf0.001 documents;
                   returns a one-row-per-component summary DataFrame.
``queries()``    — one callable per implemented operator/pipeline
                   (SURVEY.md §2 + the training-data operator suite).
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
                   (tables region nation customer supplier part orders
                   lineitem events documents embeddings are pre-registered
                   views over the same parquet). Fixture-golden queries use
                   VALUES literals derived from the reference's own
                   integration test (reference tests/integration_test.rs).

Ray is initialised by the driver BEFORE this module is imported — nothing
here calls ray.init()/ray.shutdown().

Column names match between each query and its oracle (the driver's compare
sorts columns by name before value-hashing).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --------------------------------------------------------------------------
# deterministic synthetic inputs shared by engine and oracle
# --------------------------------------------------------------------------

_PAGES_CACHE = "/tmp/osmray_pages_r{replicas}_seed42_sharded"

# point synthesis from customer keys — IDENTICAL arithmetic in SQL oracle
_LAT_EXPR = "(-3.0 + ((c_custkey * 2654435761) % 100000) / 100000.0 * 2.0)"
_LON_EXPR = "(-80.5 + ((c_custkey * 40503) % 100000) / 100000.0 * 2.0)"

_PIP_RECTS = [
    # (poly_id, lat0, lat1, lon0, lon1) — bounds at 7 decimals so no
    # synthesized point (5-decimal lattice) ever lands exactly on an edge
    (1, -2.7123457, -1.9876543, -80.1234567, -79.3765433),
    (2, -2.9876543, -2.5123457, -80.4567891, -79.9876543),
    (3, -1.5123457, -1.0876543, -79.5123457, -78.7876543),
]

_KNN_K = 3
_KNN_RADIUS_M = 5000.0

_EN_STOP = ("the", "and", "of", "to", "in", "is", "that", "for", "with", "as")
_ES_STOP = ("el", "la", "de", "que", "y", "en", "los", "del", "las", "por")
_STOP_RE_EN = r"\b(" + "|".join(_EN_STOP) + r")\b"
_STOP_RE_ES = r"\b(" + "|".join(_ES_STOP) + r")\b"


def _fixture_pages(replicas: int = 1) -> str:
    path = _PAGES_CACHE.format(replicas=replicas)
    if not os.path.exists(path):
        from osmptparser_ray.sources import synthesize_pages_parquet

        synthesize_pages_parquet(path, replicas=replicas, files=16)
    return path


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _customer_points(sf_dir: str):
    """customer → deterministic (point_id, lat, lon) Dataset."""

    def synth(batch: pa.Table) -> pa.Table:
        keys = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat = -3.0 + ((keys * 2654435761) % 100000) / 100000.0 * 2.0
        lon = -80.5 + ((keys * 40503) % 100000) / 100000.0 * 2.0
        return pa.table(
            {
                "point_id": pa.array(keys, pa.int64()),
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
            }
        )

    return _read(sf_dir, "customer", ["c_custkey"]).map_batches(synth, batch_format="pyarrow")


# --------------------------------------------------------------------------
# entry
# --------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline; returns component→row-count summary (stable schema)."""
    import pandas as pd

    from osmptparser_ray.pipelines.spatial_join import stop_route_spatial_join
    from osmptparser_ray.text.analysis import add_quality_scores

    out = stop_route_spatial_join(_fixture_pages(2))
    docs = add_quality_scores(_read("/root/testdata/sf0.001", "documents"))
    rows = [
        ("public_transports", out["public_transports"].count()),
        ("stops", out["stops"].count()),
        ("pip_pairs", out["pip"].count()),
        ("knn_pairs", out["knn"].count()),
        ("tile_assignments", out["tiles"].count()),
        ("documents_scored", docs.count()),
    ]
    return pd.DataFrame(rows, columns=["component", "rows"])


# --------------------------------------------------------------------------
# queries — OSM fixture goldens
# --------------------------------------------------------------------------


def _q_ptv2_fixture(sf_dir: str):
    from osmptparser_ray.pipelines.ptv2 import public_transports_from_pages

    ds = public_transports_from_pages(_fixture_pages(1), gap=1500.0)

    def project(batch: pa.Table) -> pa.Table:
        from osmptparser_ray.kernel.filters import get_tag_values

        names = get_tag_values(batch, "name", "tags")
        versions = get_tag_values(batch, "version", "info")
        timestamps = get_tag_values(batch, "timestamp", "info")
        n_stops = pc.list_value_length(batch["stops"])
        n_geom = [
            sum(len(seg) for seg in g) for g in batch["geometry"].to_pylist()
        ]
        return pa.table(
            {
                "id": batch["id"],
                "name": pa.array(names.tolist(), pa.string()),
                "version": pa.array(versions.tolist(), pa.string()),
                "ts": pa.array(timestamps.tolist(), pa.string()),
                "n_stops": pc.cast(n_stops, pa.int64()),
                "status_code": batch["status_code"],
                "n_geom_points": pa.array(n_geom, pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def _q_ptv2_from_pbf(sf_dir: str):
    """The SAME observable as ptv2_fixture, but ingested from the
    reference's literal ``.osm.pbf`` binary (sources.pbf blob-parallel
    source) instead of the page corpus — one oracle, two sources: proves
    the PBF front half feeds the shared pipeline identically."""
    from osmptparser_ray.pipelines.ptv2 import public_transports_from_pbf

    ds = public_transports_from_pbf("/root/reference/tests/test.pbf", gap=1500.0)

    def project(batch: pa.Table) -> pa.Table:
        from osmptparser_ray.kernel.filters import get_tag_values

        names = get_tag_values(batch, "name", "tags")
        versions = get_tag_values(batch, "version", "info")
        timestamps = get_tag_values(batch, "timestamp", "info")
        n_stops = pc.list_value_length(batch["stops"])
        n_geom = [
            sum(len(seg) for seg in g) for g in batch["geometry"].to_pylist()
        ]
        return pa.table(
            {
                "id": batch["id"],
                "name": pa.array(names.tolist(), pa.string()),
                "version": pa.array(versions.tolist(), pa.string()),
                "ts": pa.array(timestamps.tolist(), pa.string()),
                "n_stops": pc.cast(n_stops, pa.int64()),
                "status_code": batch["status_code"],
                "n_geom_points": pa.array(n_geom, pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def _q_areas_fixture(sf_dir: str):
    """Standalone-way areas over the fixture ('highway' filter), per-row
    ring size + status — regression golden frozen from the verified engine
    (kernel verified against the reference fixture; see tests)."""
    from osmptparser_ray.pipelines.ptv2 import areas_from_pages

    ds = areas_from_pages(_fixture_pages(1), gap=150.0, filters="highway")

    def project(batch: pa.Table) -> pa.Table:
        n_rings = pc.list_value_length(batch["geometry"])
        n_pts = [sum(len(seg) for seg in g) for g in batch["geometry"].to_pylist()]
        return pa.table(
            {
                "id": batch["id"],
                "id_type": batch["id_type"],
                "status_code": batch["status_code"],
                "n_rings": pc.cast(n_rings, pa.int64()),
                "n_points": pa.array(n_pts, pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


# --------------------------------------------------------------------------
# queries — relational operators over the TPC-H-ish tables
# --------------------------------------------------------------------------


def _q_groupby_agg(sf_dir: str):
    """Partial-aggregate inside map_batches, then a small groupby — the
    pre-aggregation pattern (SURVEY §2.5 / guide 'Aggregation at scale')."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        batch = batch.append_column("revenue", rev)
        t = batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("revenue", "sum"), ("l_quantity", "count")]
        )
        return t.rename_columns(
            ["l_returnflag", "l_linestatus", "p_qty", "p_rev", "p_n"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("p_qty", alias_name="sum_qty"),
        Sum("p_rev", alias_name="p_rev_sum"),
        Sum("p_n", alias_name="n_rows"),
    )

    def int_rev(batch: pa.Table) -> pa.Table:
        # float sums are association-order-dependent across distributed
        # partials (~1e-6 rel); round to whole units so the comparison is
        # exact while still validating the aggregation
        rev = np.round(batch["p_rev_sum"].to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": batch["sum_qty"],
                "sum_revenue": pa.array(rev, pa.int64()),
                "n_rows": batch["n_rows"],
            }
        )

    return out.map_batches(int_rev, batch_format="pyarrow")


def _q_semi_join(sf_dir: str):
    """Broadcast semi-join: orders ⋉ rich customers → counts by status."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    rich = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    # the filter + per-block dedup runs DISTRIBUTED; only the (small)
    # qualifying key set ever reaches the driver, not the customer table
    def key_blob(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b["c_acctbal"], 5000.0))
        u = np.unique(t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"blob": pa.array([u.tobytes()], pa.binary())})

    keys = []
    for b in rich.map_batches(key_blob, batch_format="pyarrow").iter_batches(
        batch_size=64, batch_format="pyarrow"
    ):
        for raw in b["blob"].to_pylist():
            if raw:
                keys.append(np.frombuffer(raw, np.int64))
    key_arr = np.unique(np.concatenate(keys)) if keys else np.empty(0, np.int64)
    ref = ray.put(key_arr)

    def semi(batch: pa.Table) -> pa.Table:
        hay = ray.get(ref)
        vals = batch["o_custkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(hay, vals)
        idx[idx >= len(hay)] = max(len(hay) - 1, 0)
        keep = hay[idx] == vals if len(hay) else np.zeros(len(vals), bool)
        return batch.filter(pa.array(keep))

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
    out = orders.map_batches(semi, batch_format="pyarrow").groupby("o_orderstatus").aggregate(
        Count(alias_name="n")
    )
    return out


def _q_hash_join(sf_dir: str):
    """Distributed hash join lineitem ⨝ orders + grouped revenue."""
    import ray
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(batch: pa.Table) -> pa.Table:
        r = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({"l_orderkey": batch["l_orderkey"], "revenue": r})

    li = li.map_batches(rev, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    from osmptparser_ray.util import join_partitions

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=join_partitions(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )
    out = joined.groupby("o_orderpriority").aggregate(Sum("revenue", alias_name="rev_sum"))

    def int_rev(batch: pa.Table) -> pa.Table:
        rev = np.round(batch["rev_sum"].to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table(
            {"o_orderpriority": batch["o_orderpriority"], "revenue": pa.array(rev, pa.int64())}
        )

    return out.map_batches(int_rev, batch_format="pyarrow")


def _q_topk(sf_dir: str):
    """Global sort + limit (top-k)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def _q_filter_dsl(sf_dir: str):
    """Tag-filter DSL applied to events (props JSON + event_type as a tag map)."""
    import json

    from osmptparser_ray.kernel.filters import TagFilter, dicts_to_map_array

    f = TagFilter("event_type=click,purchase&k=1,2,3,42")

    def apply(batch: pa.Table) -> pa.Table:
        tags = [
            {"event_type": et, "k": str(json.loads(p)["k"])}
            for et, p in zip(batch["event_type"].to_pylist(), batch["props"].to_pylist())
        ]
        t = pa.table(
            {"event_id": batch["event_id"], "tags": dicts_to_map_array(tags)}
        )
        mask = f.mask_table(t, "tags")
        return pa.table({"event_id": batch["event_id"]}).filter(pa.array(mask))

    return _read(sf_dir, "events", ["event_id", "event_type", "props"]).map_batches(
        apply, batch_format="pyarrow"
    )


def _q_window_tumbling(sf_dir: str):
    """Tumbling 1h window per user: count + value sum (stream-shaped op)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def win(batch: pa.Table) -> pa.Table:
        micros = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = micros // (3600 * 1_000_000)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "window_id": pa.array(w, pa.int64()),
                "value": batch["value"],
            }
        )

    return (
        ds.map_batches(win, batch_format="pyarrow")
        .groupby(["user_id", "window_id"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )


def _q_union_distinct(sf_dir: str):
    """Union + distinct: nation keys present in customer ∪ supplier.

    Distinct = per-batch local dedup (combiner) then a groupby-aggregate,
    projecting the key back out — no per-group UDF."""
    from ray.data.aggregate import Count

    c = _read(sf_dir, "customer", ["c_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": pc.cast(t["c_nationkey"], pa.int64()).unique()}),
        batch_format="pyarrow",
    )
    s = _read(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": pc.cast(t["s_nationkey"], pa.int64()).unique()}),
        batch_format="pyarrow",
    )
    out = c.union(s).groupby("nationkey").aggregate(Count(alias_name="n"))
    return out.select_columns(["nationkey"])


# --------------------------------------------------------------------------
# queries — text / dedup / embeddings
# --------------------------------------------------------------------------


def _q_token_count(sf_dir: str):
    from osmptparser_ray.text.analysis import add_token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return add_token_count(ds).select_columns(["doc_id", "n_tokens"])


def _q_bpe_tokens(sf_dir: str):
    from osmptparser_ray.text.analysis import add_bpe_token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return add_bpe_token_count(ds).select_columns(["doc_id", "n_bpe_tokens"])


def _q_quality(sf_dir: str):
    from osmptparser_ray.text.analysis import add_quality_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return add_quality_scores(ds).select_columns(
        ["doc_id", "q_chars", "q_tokens", "q_punct", "q_stop_en", "q_stop_es"]
    )


def _q_langid(sf_dir: str):
    from osmptparser_ray.text.analysis import add_lang_id

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return add_lang_id(ds).select_columns(["doc_id", "lang_pred"])


def _q_fingerprint(sf_dir: str):
    from osmptparser_ray.text.analysis import add_fingerprint

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return add_fingerprint(ds).select_columns(["doc_id", "fingerprint"])


def _q_quality_filter(sf_dir: str):
    """Quality gate: docs with ≥ 40 tokens, punct density ≤ 0.05, ≥ 1
    stopword hit — returns surviving doc ids."""
    from osmptparser_ray.text.analysis import quality_filter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return quality_filter(
        ds, min_tokens=40, max_punct_ratio=0.05, min_stop_hits=1
    ).select_columns(["doc_id"])


def _q_exact_dedup(sf_dir: str):
    from osmptparser_ray.text.dedup import exact_dedup

    return exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))


def _q_duplicate_groups(sf_dir: str):
    """Connected components over a synthetic chain graph with a closed-form
    oracle: edges (d, d+1) for d%10<3 ⇒ components are runs of 4, rep =
    floor(d/10)*10."""
    import ray.data as rd

    from osmptparser_ray.text.dedup import duplicate_groups

    docs = _read(sf_dir, "documents", ["doc_id"])

    def chain_pairs(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = d % 10 < 3
        return pa.table(
            {
                "doc_a": pa.array(d[keep], pa.int64()),
                "doc_b": pa.array(d[keep] + 1, pa.int64()),
            }
        )

    return duplicate_groups(docs.map_batches(chain_pairs, batch_format="pyarrow"))


def _q_minhash_pairs(sf_dir: str):
    """MinHash-LSH candidate pairs verified by exact Jaccard ≥ 0.5."""
    from osmptparser_ray.text.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        verify_jaccard,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    sigs = minhash_signatures(docs, num_perm=64, shingle_k=5)
    pairs = lsh_candidate_pairs(sigs, bands=16)
    return verify_jaccard(pairs, docs, threshold=0.5).select_columns(
        ["doc_a", "doc_b"]
    )


def _q_simhash(sf_dir: str):
    from osmptparser_ray.text.dedup import simhash_signatures

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    sigs = simhash_signatures(docs)

    def as_int(batch: pa.Table) -> pa.Table:
        # uint64 → hex string (driver-side hashing of uint64 can overflow in
        # pandas conversions; hex is lossless and portable)
        vals = [f"{v:016x}" for v in batch["simhash"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "simhash_hex": pa.array(vals, pa.string())})

    return sigs.map_batches(as_int, batch_format="pyarrow")


def _q_ann_topk(sf_dir: str):
    """Exact cosine top-k: first 5 vectors as queries vs all embeddings."""
    import pyarrow.parquet as pq

    from osmptparser_ray.embed.ann import knn_bruteforce

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    mask = pc.less(t["vec_id"], 5)
    qt = t.filter(mask)
    q = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
    qids = qt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    vectors = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_bruteforce(vectors, q, qids, k=5)
    return out.select_columns(["query_id", "rank", "vec_id"])


def _q_ann_ivf_topk(sf_dir: str):
    """IVF ANN with full probing (n_probe == n_lists) — must equal the
    brute-force cosine oracle exactly, proving the quantizer/probe/refine
    machinery loses nothing when fully probed."""
    import pyarrow.parquet as pq

    from osmptparser_ray.embed.ann import ivf_ann

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    qt = t.filter(pc.less(t["vec_id"], 5))
    q = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
    qids = qt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    vectors = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ivf_ann(vectors, q, qids, k=5, n_lists=8, n_probe=8)
    return out.select_columns(["query_id", "rank", "vec_id"])


def _q_cosine_near_dup(sf_dir: str):
    """Planted-duplicate golden with a CLOSED-FORM oracle (engine-free).

    Construction: 24 base vectors along distinct coordinate axes at
    varying positive scales (pairwise cosine exactly 0), plus 12 exact
    same-direction copies at different scales (cosine exactly 1 with
    their base, 0 with everything else). With threshold 0.95 the output
    is therefore EXACTLY the 12 planted (base, copy) pairs — provable
    from the construction, independent of the engine. Same-direction
    vectors always share an LSH bucket (hyperplane signs are scale-
    invariant), so recall is exact too. The real-embedding near-dup
    behavior is covered by the brute-force-compared pytest oracles."""
    import ray.data as rd

    from osmptparser_ray.embed.ann import cosine_near_dup

    dim, n_base = 32, 24
    ids, vecs = [], []
    for i in range(n_base):
        v = [0.0] * dim
        v[i % dim] = 1.0 + 0.25 * i
        ids.append(i)
        vecs.append(v)
    for j in range(12):
        base = 2 * j
        v = [0.0] * dim
        v[base % dim] = 0.5 + 0.1 * j
        ids.append(1000 + base)
        vecs.append(v)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
        }
    )
    out = cosine_near_dup(rd.from_arrow(tbl), threshold=0.95, bits=4)
    return out.select_columns(["doc_a", "doc_b"])


# --------------------------------------------------------------------------
# queries — spatial
# --------------------------------------------------------------------------


def _q_cell_assign(sf_dir: str):
    """Grid-coordinate assignment at level 12 (SQL-checkable x/y form)."""
    from osmptparser_ray.spatial.cell import lonlat_to_xy

    pts = _customer_points(sf_dir)

    def assign(batch: pa.Table) -> pa.Table:
        x, y = lonlat_to_xy(
            batch["lat"].to_numpy(zero_copy_only=False),
            batch["lon"].to_numpy(zero_copy_only=False),
            12,
        )
        return pa.table(
            {
                "point_id": batch["point_id"],
                "cell_x": pa.array(x, pa.int64()),
                "cell_y": pa.array(y, pa.int64()),
            }
        )

    return pts.map_batches(assign, batch_format="pyarrow")


def _q_pip_rect(sf_dir: str):
    import ray.data as rd

    from osmptparser_ray.spatial.join import pip_join

    pts = _customer_points(sf_dir)
    polys = rd.from_items(
        [
            {
                "poly_id": pid,
                "ring_lats": [la0, la0, la1, la1],
                "ring_lons": [lo0, lo1, lo1, lo0],
            }
            for pid, la0, la1, lo0, lo1 in _PIP_RECTS
        ]
    )
    return pip_join(pts, polys, level=10, salt=2)


def _q_spatial_knn(sf_dir: str):
    from osmptparser_ray.spatial.join import knn_join

    pts = _customer_points(sf_dir)
    targets = pts.map_batches(
        lambda t: pa.table(
            {"target_id": t["point_id"], "lat": t["lat"], "lon": t["lon"]}
        ),
        batch_format="pyarrow",
    )
    out = knn_join(pts, targets, k=_KNN_K, radius_m=_KNN_RADIUS_M)
    return out.select_columns(["point_id", "rank", "neighbor_id"])


def _q_cell_density(sf_dir: str):
    """Per-cell density + 3x3 smoothed density at level 12 (windowed raster
    aggregate); correlated-subquery SQL oracle."""
    from osmptparser_ray.spatial.join import cell_density_smoothed

    return cell_density_smoothed(_customer_points(sf_dir), 12)


def _q_raster_vector(sf_dir: str):
    """Tile cover of the fixture's OK route vs a tile pyramid level."""
    import ray.data as rd

    from osmptparser_ray.pipelines.ptv2 import public_transports_from_pages
    from osmptparser_ray.spatial.cell import cover_bbox
    from osmptparser_ray.spatial.join import raster_vector_join

    pt = public_transports_from_pages(_fixture_pages(1), gap=1500.0)
    level = 13
    tiles = rd.from_arrow(
        pa.table(
            {"cell": pa.array(cover_bbox(-80.1, -2.3, -79.8, -2.0, level), pa.uint64())}
        )
    )
    out = raster_vector_join(tiles, pt, level)

    def to_str(batch: pa.Table) -> pa.Table:
        # uint64 cells → hex for portable driver-side hashing
        return pa.table(
            {
                "cell_hex": pa.array(
                    [f"{c:016x}" for c in batch["cell"].to_pylist()], pa.string()
                ),
                "route_id": batch["route_id"],
            }
        )

    return out.map_batches(to_str, batch_format="pyarrow")


def _q_multimodal_image(sf_dir: str):
    """REAL image decode path with a CLOSED-FORM oracle: 32 constant-color
    PPM(P6) images (color i = ((i*37)%256, (i*59)%256, (i*83)%256)) run
    through the actor-pool decode → mean-pool → channel-stats stage with
    fake=False; a constant image's channel means are exactly its color, so
    the VALUES oracle is provable from the construction. (The fake-decode
    plumbing variant stays pytest-covered.)"""
    import ray.data as rd

    from osmptparser_ray.multimodal import (
        MEDIA_SCHEMA,
        encode_ppm,
        image_features,
    )

    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(32):
        c = ((i * 37) % 256, (i * 59) % 256, (i * 83) % 256)
        img = np.full((64, 64, 3), c, np.uint8)
        p = encode_ppm(img)
        rows["media_id"].append(i)
        rows["media_type"].append("image/ppm")
        rows["payload"].append(p)
        rows["meta_width"].append(64)
        rows["meta_height"].append(64)
        rows["meta_sample_rate"].append(0)
        rows["n_bytes"].append(len(p))
    media = rd.from_arrow(
        pa.table(
            {n: pa.array(rows[n], MEDIA_SCHEMA.field(n).type) for n in MEDIA_SCHEMA.names}
        )
    )
    out = image_features(media, fake=False)
    return out.map_batches(
        lambda t: pa.table(
            {
                "media_id": t["media_id"],
                "mean_r": pc.cast(t["feat_mean_r"], pa.int64()),
                "mean_g": pc.cast(t["feat_mean_g"], pa.int64()),
                "mean_b": pc.cast(t["feat_mean_b"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _q_checkpoint_resume(sf_dir: str):
    """Partitioned write + resume: second run must skip all partitions."""
    import shutil
    import tempfile

    import pandas as pd

    from osmptparser_ray.state.checkpoint import completed_partitions, run_partitioned

    out_dir = os.path.join(tempfile.gettempdir(), "osmray_ckpt_demo")
    shutil.rmtree(out_dir, ignore_errors=True)

    def make(p: str):
        ds = _read(sf_dir, "region")
        return ds

    parts = ["p0", "p1"]
    run_partitioned(parts, make, out_dir)
    before = {k: v.rows for k, v in completed_partitions(out_dir).items()}
    # resume: nothing recomputed
    recs = run_partitioned(parts, make, out_dir)
    return pd.DataFrame(
        {
            "partition": sorted(before),
            "rows": [before[p] for p in sorted(before)],
            "resumed_count": [len(recs)] * len(before),
        }
    )


def _q_det_sample(sf_dir: str):
    """Deterministic hash sample (30%) of orders + stratified doc sample
    (per-lang fractions) — reproducible splits with closed-form SQL."""
    from osmptparser_ray.stages.relational import deterministic_sample

    orders = _read(sf_dir, "orders", ["o_orderkey"])
    return deterministic_sample(orders, 0.3, "o_orderkey")


def _q_stratified_sample(sf_dir: str):
    from osmptparser_ray.stages.relational import stratified_sample

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    return stratified_sample(
        docs, {"en": 0.5, "es": 0.2}, "lang", "doc_id"
    ).select_columns(["doc_id", "lang"])


def _q_topk_per_group(sf_dir: str):
    """Top-3 documents per source by n_chars (ties by doc_id asc)."""
    from osmptparser_ray.stages.relational import topk_per_group

    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    out = topk_per_group(docs, "source", "n_chars", 3, tiebreak_col="doc_id")
    return out.select_columns(["source", "rank", "doc_id", "n_chars"])


def _q_broadcast_enrich(sf_dir: str):
    """Map-side broadcast join: orders enriched with customer mktsegment →
    counts per segment (no shuffle on the fact side until the tiny final
    aggregate)."""
    from ray.data.aggregate import Count

    from osmptparser_ray.stages.relational import broadcast_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = broadcast_join(orders, cust, on="o_custkey", right_on="c_custkey")
    return (
        joined.groupby("c_mktsegment").aggregate(Count(alias_name="n_orders"))
    )


def _q_sessionize(sf_dir: str):
    """Session windows over the events stream (30-min gap)."""
    from osmptparser_ray.streams import sessionize

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    # carry a value-free projection; sessionize needs event_id for ordering
    out = sessionize(ev, gap_seconds=1800.0)
    return out.select_columns(["user_id", "session_id", "n_events", "start_us", "end_us"])


def _q_parser_summary(sf_dir: str):
    """Per-relation way/stop/node counts (reference Debug impl,
    mod.rs:745-770) over the fixture — golden VALUES oracle."""
    from osmptparser_ray.pipelines.parser_api import parser_summary
    from osmptparser_ray.pipelines.ptv2 import parser_tables_from_pages
    from osmptparser_ray.kernel.filters import PTV2

    tables = parser_tables_from_pages(_fixture_pages(1), PTV2)
    return parser_summary(tables)


def _q_admin_areas(sf_dir: str):
    """Relation-type areas ('r', closed rings): closable ring → 102 with the
    closing point appended; broken ring → 501 with empty-ring geometry
    (reference relation.rs:286-299 status merge). Golden VALUES oracle."""
    import tempfile

    from osmptparser_ray.kernel.filters import AA
    from osmptparser_ray.pipelines.ptv2 import areas_from_pages
    from osmptparser_ray.sources.pages import synthesize_admin_pages_parquet

    p = os.path.join(tempfile.gettempdir(), "osmray_admin_pages.parquet")
    if not os.path.exists(p):
        synthesize_admin_pages_parquet(p)
    ds = areas_from_pages(p, gap=150.0, filters=AA)

    def project(batch: pa.Table) -> pa.Table:
        from osmptparser_ray.kernel.filters import get_tag_values

        names = get_tag_values(batch, "name", "tags")
        n_pts = [sum(len(r) for r in g) for g in batch["geometry"].to_pylist()]
        return pa.table(
            {
                "id": batch["id"],
                "id_type": batch["id_type"],
                "name": pa.array(names.tolist(), pa.string()),
                "status_code": batch["status_code"],
                "n_ring_points": pa.array(n_pts, pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "ptv2_fixture": _q_ptv2_fixture,
        "ptv2_from_pbf": _q_ptv2_from_pbf,
        "areas_fixture": _q_areas_fixture,
        "groupby_agg": _q_groupby_agg,
        "semi_join_broadcast": _q_semi_join,
        "hash_join_revenue": _q_hash_join,
        "topk_orders": _q_topk,
        "filter_dsl_events": _q_filter_dsl,
        "window_tumbling": _q_window_tumbling,
        "union_distinct": _q_union_distinct,
        "token_count": _q_token_count,
        "bpe_token_count": _q_bpe_tokens,
        "quality_scores": _q_quality,
        "lang_id": _q_langid,
        "fingerprint": _q_fingerprint,
        "exact_dedup": _q_exact_dedup,
        "quality_filter": _q_quality_filter,
        "duplicate_groups": _q_duplicate_groups,
        "minhash_near_dup": _q_minhash_pairs,
        "simhash": _q_simhash,
        "ann_cosine_topk": _q_ann_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "cosine_near_dup": _q_cosine_near_dup,
        "cell_assign": _q_cell_assign,
        "pip_rect": _q_pip_rect,
        "spatial_knn": _q_spatial_knn,
        "raster_vector": _q_raster_vector,
        "cell_density": _q_cell_density,
        "multimodal_image": _q_multimodal_image,
        "checkpoint_resume": _q_checkpoint_resume,
        "sessionize": _q_sessionize,
        "topk_per_group": _q_topk_per_group,
        "deterministic_sample": _q_det_sample,
        "stratified_sample": _q_stratified_sample,
        "broadcast_enrich": _q_broadcast_enrich,
        "parser_summary": _q_parser_summary,
        "admin_areas": _q_admin_areas,
    }


# --------------------------------------------------------------------------
# oracle SQL
# --------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    rects_values = ", ".join(
        f"({pid}, {la0!r}, {la1!r}, {lo0!r}, {lo1!r})"
        for pid, la0, la1, lo0, lo1 in _PIP_RECTS
    )
    hav = (
        "2.0 * 6371000.0 * atan2(sqrt("
        "sin(radians(b.lat - a.lat) / 2.0) * sin(radians(b.lat - a.lat) / 2.0)"
        " + cos(radians(a.lat)) * cos(radians(b.lat))"
        " * sin(radians(b.lon - a.lon) / 2.0) * sin(radians(b.lon - a.lon) / 2.0)"
        "), sqrt(1.0 - ("
        "sin(radians(b.lat - a.lat) / 2.0) * sin(radians(b.lat - a.lat) / 2.0)"
        " + cos(radians(a.lat)) * cos(radians(b.lat))"
        " * sin(radians(b.lon - a.lon) / 2.0) * sin(radians(b.lon - a.lon) / 2.0)"
        ")))"
    )
    points_cte = (
        f"SELECT c_custkey AS point_id, {_LAT_EXPR} AS lat, {_LON_EXPR} AS lon FROM customer"
    )
    return {
        # golden VALUES from the reference's integration test
        # (tests/integration_test.rs:9-18) + transliteration-verified
        # geometry counts (FIXTURES.md §2)
        "ptv2_fixture": (
            "SELECT CAST(id AS BIGINT) AS id, name, version, ts, "
            "CAST(n_stops AS BIGINT) AS n_stops, "
            "CAST(status_code AS BIGINT) AS status_code, "
            "CAST(n_geom_points AS BIGINT) AS n_geom_points FROM (VALUES "
            "(85965, 'Trolebus Quitumbe => La Y', '226', '1552883955', 31, 501, 0), "
            "(2030162, 'B6 Mapasingue Oeste Ida', '13', '1555013271', 1, 0, 90)"
            ") AS t(id, name, version, ts, n_stops, status_code, n_geom_points)"
        ),
        # identical golden, PBF-binary ingest path (one oracle, two sources)
        "ptv2_from_pbf": (
            "SELECT CAST(id AS BIGINT) AS id, name, version, ts, "
            "CAST(n_stops AS BIGINT) AS n_stops, "
            "CAST(status_code AS BIGINT) AS status_code, "
            "CAST(n_geom_points AS BIGINT) AS n_geom_points FROM (VALUES "
            "(85965, 'Trolebus Quitumbe => La Y', '226', '1552883955', 31, 501, 0), "
            "(2030162, 'B6 Mapasingue Oeste Ida', '13', '1555013271', 1, 0, 90)"
            ") AS t(id, name, version, ts, n_stops, status_code, n_geom_points)"
        ),
        "groupby_agg": (
            "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
            "CAST(round(sum(l_extendedprice * (1.0 - l_discount)), 0) AS BIGINT) AS sum_revenue, "
            "count(*) AS n_rows FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "semi_join_broadcast": (
            "SELECT o_orderstatus, count(*) AS n FROM orders WHERE o_custkey IN "
            "(SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0) "
            "GROUP BY o_orderstatus"
        ),
        "hash_join_revenue": (
            "SELECT o_orderpriority, CAST(round(sum(l_extendedprice * (1.0 - l_discount)), 0) AS BIGINT) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority"
        ),
        "topk_orders": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"
        ),
        "filter_dsl_events": (
            "SELECT event_id FROM events WHERE event_type IN ('click', 'purchase') "
            "AND json_extract_string(props, '$.k') IN ('1', '2', '3', '42')"
        ),
        "window_tumbling": (
            "SELECT user_id, CAST(floor(epoch(ts) / 3600.0) AS BIGINT) AS window_id, "
            "count(*) AS n_events, sum(value) AS sum_value "
            "FROM events GROUP BY user_id, window_id"
        ),
        "union_distinct": (
            "SELECT DISTINCT CAST(nationkey AS BIGINT) AS nationkey FROM ("
            "SELECT c_nationkey AS nationkey FROM customer "
            "UNION ALL SELECT s_nationkey FROM supplier)"
        ),
        "token_count": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT)"
            " AS n_tokens FROM documents"
        ),
        "bpe_token_count": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, "
            "'''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'"
            ")) AS BIGINT) AS n_bpe_tokens FROM documents"
        ),
        "quality_scores": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS q_chars, "
            "CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS q_tokens, "
            "CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT) AS q_punct, "
            f"CAST(len(regexp_extract_all(text, '{_STOP_RE_EN}')) AS BIGINT) AS q_stop_en, "
            f"CAST(len(regexp_extract_all(text, '{_STOP_RE_ES}')) AS BIGINT) AS q_stop_es "
            "FROM documents"
        ),
        "lang_id": (
            "SELECT doc_id, CASE "
            f"WHEN len(regexp_extract_all(text, '{_STOP_RE_EN}')) > len(regexp_extract_all(text, '{_STOP_RE_ES}')) THEN 'en' "
            f"WHEN len(regexp_extract_all(text, '{_STOP_RE_ES}')) > len(regexp_extract_all(text, '{_STOP_RE_EN}')) THEN 'es' "
            "ELSE 'und' END AS lang_pred FROM documents"
        ),
        "fingerprint": (
            "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
            " AS fingerprint FROM documents"
        ),
        "quality_filter": (
            "SELECT doc_id FROM documents WHERE "
            "len(regexp_extract_all(text, '[A-Za-z0-9_]+')) >= 40 "
            "AND CAST(len(regexp_extract_all(text, '[.!?]')) AS DOUBLE) / "
            "greatest(len(regexp_extract_all(text, '[A-Za-z0-9_]+')), 1) <= 0.05 "
            f"AND len(regexp_extract_all(text, '{_STOP_RE_EN}')) + "
            f"len(regexp_extract_all(text, '{_STOP_RE_ES}')) >= 1"
        ),
        "exact_dedup": (
            "SELECT md5(text) AS content_md5, min(doc_id) AS doc_id, "
            "count(*) AS n_dups FROM documents GROUP BY md5(text)"
        ),
        "duplicate_groups": (
            "SELECT doc_id, CAST(floor(doc_id / 10) * 10 AS BIGINT) AS rep_id "
            "FROM (SELECT doc_id FROM documents WHERE doc_id % 10 < 3 "
            "UNION SELECT doc_id + 1 FROM documents WHERE doc_id % 10 < 3) t(doc_id)"
        ),
        "ann_cosine_topk": (
            "SELECT query_id, rank, vec_id FROM ("
            "SELECT q.vec_id AS query_id, t.vec_id AS vec_id, "
            "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            "list_cosine_similarity(CAST(t.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) DESC, "
            "t.vec_id ASC) AS rank "
            "FROM embeddings q CROSS JOIN embeddings t WHERE q.vec_id < 5) "
            "WHERE rank <= 5"
        ),
        # key masked to 31 bits BEFORE the multiply: the largest BIGINT
        # intermediate is (2^31-1)*2654435761 ~= 5.7e18 < 2^63, so this SQL
        # is overflow-safe for ANY non-negative id (see deterministic_sample)
        "deterministic_sample": (
            "SELECT o_orderkey FROM orders WHERE "
            "((o_orderkey % 2147483648) * 2654435761) % 4294967296 "
            "< CAST(0.3 * 4294967296 AS BIGINT)"
        ),
        "stratified_sample": (
            "SELECT doc_id, lang FROM documents WHERE "
            "((doc_id % 2147483648) * 2654435761) % 4294967296 < CASE lang "
            "WHEN 'en' THEN CAST(0.5 * 4294967296 AS BIGINT) "
            "WHEN 'es' THEN CAST(0.2 * 4294967296 AS BIGINT) ELSE 0 END"
        ),
        "topk_per_group": (
            "SELECT source, rank, doc_id, n_chars FROM ("
            "SELECT source, doc_id, n_chars, "
            "CAST(row_number() OVER (PARTITION BY source "
            "ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rank "
            "FROM documents) WHERE rank <= 3"
        ),
        "broadcast_enrich": (
            "SELECT c_mktsegment, count(*) AS n_orders FROM orders "
            "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
        ),
        "sessionize": (
            "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events, "
            "min(us) AS start_us, max(us) AS end_us FROM ("
            "SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, "
            "sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS session_id FROM ("
            "SELECT user_id, event_id, ts, CASE WHEN lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
            "OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id)) > 1800000000 THEN 1 ELSE 0 END AS is_new "
            "FROM events))"
            " GROUP BY user_id, session_id"
        ),
        "admin_areas": (
            "SELECT CAST(id AS BIGINT) AS id, id_type, name, "
            "CAST(status_code AS BIGINT) AS status_code, "
            "CAST(n_ring_points AS BIGINT) AS n_ring_points FROM (VALUES "
            "(9000, 'r', 'Distrito A', 102, 5), "
            "(9001, 'r', 'Distrito B', 501, 0)"
            ") AS t(id, id_type, name, status_code, n_ring_points)"
        ),
        "parser_summary": (
            "SELECT CAST(id AS BIGINT) AS id, name, "
            "CAST(n_ways AS BIGINT) AS n_ways, CAST(n_stops AS BIGINT) AS n_stops, "
            "CAST(n_nodes AS BIGINT) AS n_nodes FROM (VALUES "
            "(85965, 'Trolebus Quitumbe => La Y', 106, 31, 575), "
            "(2030162, 'B6 Mapasingue Oeste Ida', 20, 1, 109)"
            ") AS t(id, name, n_ways, n_stops, n_nodes)"
        ),
        "ann_ivf_topk": (
            "SELECT query_id, rank, vec_id FROM ("
            "SELECT q.vec_id AS query_id, t.vec_id AS vec_id, "
            "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            "list_cosine_similarity(CAST(t.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) DESC, "
            "t.vec_id ASC) AS rank "
            "FROM embeddings q CROSS JOIN embeddings t WHERE q.vec_id < 5) "
            "WHERE rank <= 5"
        ),
        "cell_assign": (
            "SELECT point_id, "
            "CAST(least(greatest(floor((lon + 180.0) / 360.0 * 4096), 0), 4095) AS BIGINT) AS cell_x, "
            "CAST(least(greatest(floor((lat + 90.0) / 180.0 * 4096), 0), 4095) AS BIGINT) AS cell_y "
            f"FROM ({points_cte})"
        ),
        "cell_density": (
            "WITH pts AS (" +
            f"SELECT {_LAT_EXPR} AS lat, {_LON_EXPR} AS lon FROM customer" +
            "), density AS ("
            "SELECT CAST(least(greatest(floor((lon + 180.0) / 360.0 * 4096), 0), 4095) AS BIGINT) AS cell_x, "
            "CAST(least(greatest(floor((lat + 90.0) / 180.0 * 4096), 0), 4095) AS BIGINT) AS cell_y, "
            "count(*) AS n FROM pts GROUP BY 1, 2) "
            "SELECT a.cell_x, a.cell_y, a.n, "
            "CAST((SELECT sum(b.n) FROM density b WHERE abs(a.cell_x - b.cell_x) <= 1 "
            "AND abs(a.cell_y - b.cell_y) <= 1) AS BIGINT) AS n_smoothed FROM density a"
        ),
        "pip_rect": (
            f"WITH pts AS ({points_cte}), "
            f"rects(poly_id, lat0, lat1, lon0, lon1) AS (VALUES {rects_values}) "
            "SELECT p.point_id AS point_id, CAST(r.poly_id AS BIGINT) AS poly_id FROM pts p "
            "JOIN rects r ON p.lat > r.lat0 AND p.lat < r.lat1 "
            "AND p.lon > r.lon0 AND p.lon < r.lon1"
        ),
        "spatial_knn": (
            f"WITH pts AS ({points_cte}) "
            "SELECT point_id, rank, neighbor_id FROM ("
            "SELECT a.point_id AS point_id, b.point_id AS neighbor_id, "
            f"row_number() OVER (PARTITION BY a.point_id ORDER BY {hav} ASC, b.point_id ASC) AS rank, "
            f"{hav} AS dist_m "
            "FROM pts a CROSS JOIN pts b) "
            f"WHERE rank <= {_KNN_K} AND dist_m <= {_KNN_RADIUS_M!r}"
        ),
        # Regression goldens. `areas_fixture` is ENGINE-INDEPENDENT: the
        # VALUES below are reproduced byte-identically by
        # tools/derive_goldens.py, a scalar line-by-line transliteration of
        # the reference algorithms (relation.rs:88-337) over the decoded
        # fixture, sharing no code with the engine kernel (pytest
        # test_areas_relations asserts engine == transliteration). The
        # remaining goldens are engine-frozen pins whose algorithms are
        # independently verified by pytest oracles (brute-force
        # Jaccard/hamming for minhash/simhash, cover containment for
        # raster): any behavior change fails the driver gate loudly.
        "areas_fixture": "SELECT CAST(id AS BIGINT) AS id, id_type, CAST(status_code AS BIGINT) AS status_code, CAST(n_rings AS BIGINT) AS n_rings, CAST(n_points AS BIGINT) AS n_points FROM (VALUES (24392974, 'w', 501, 1, 0), (24672257, 'w', 501, 1, 0), (24680896, 'w', 102, 1, 3), (24714721, 'w', 102, 1, 4), (24714726, 'w', 501, 1, 0), (24715204, 'w', 102, 1, 4), (24734056, 'w', 501, 1, 0), (24734667, 'w', 501, 1, 0), (24734685, 'w', 102, 1, 7), (24935354, 'w', 102, 1, 3), (24935355, 'w', 501, 1, 0), (24935356, 'w', 102, 1, 3), (24959251, 'w', 501, 1, 0), (28685802, 'w', 501, 1, 0), (31016396, 'w', 501, 1, 0), (31018344, 'w', 102, 1, 4), (31018346, 'w', 102, 1, 4), (31018349, 'w', 102, 1, 3), (31018706, 'w', 501, 1, 0), (31018762, 'w', 102, 1, 5), (31018809, 'w', 501, 1, 0), (31018978, 'w', 501, 1, 0), (31019030, 'w', 501, 1, 0), (31052220, 'w', 501, 1, 0), (31052491, 'w', 501, 1, 0), (31056285, 'w', 102, 1, 5), (31056329, 'w', 102, 1, 4), (31583647, 'w', 102, 1, 4), (35414681, 'w', 102, 1, 6), (35429734, 'w', 102, 1, 5), (75673237, 'w', 501, 1, 0), (85239534, 'w', 102, 1, 5), (95606276, 'w', 501, 1, 0), (149568931, 'w', 0, 1, 5), (149660952, 'w', 501, 1, 0), (149660953, 'w', 501, 1, 0), (149660956, 'w', 102, 1, 4), (149660957, 'w', 102, 1, 4), (149660960, 'w', 102, 1, 3), (149660963, 'w', 102, 1, 5), (149660968, 'w', 102, 1, 5), (149660970, 'w', 501, 1, 0), (149660974, 'w', 102, 1, 3), (149660975, 'w', 501, 1, 0), (149660977, 'w', 102, 1, 5), (149660979, 'w', 102, 1, 6), (149660981, 'w', 102, 1, 5), (149660984, 'w', 501, 1, 0), (149660987, 'w', 501, 1, 0), (149660988, 'w', 102, 1, 6), (149660991, 'w', 501, 1, 0), (149660992, 'w', 501, 1, 0), (149660995, 'w', 501, 1, 0), (149660997, 'w', 102, 1, 3), (149660998, 'w', 501, 1, 0), (149660999, 'w', 102, 1, 5), (149661002, 'w', 501, 1, 0), (149661004, 'w', 0, 1, 13), (149661007, 'w', 0, 1, 6), (149661009, 'w', 0, 1, 5), (149661010, 'w', 0, 1, 5), (149661014, 'w', 0, 1, 5), (149661016, 'w', 0, 1, 5), (149661017, 'w', 0, 1, 5), (149661020, 'w', 0, 1, 5), (149661021, 'w', 0, 1, 5), (149661022, 'w', 0, 1, 5), (149661023, 'w', 0, 1, 9), (150275233, 'w', 501, 1, 0), (150593568, 'w', 501, 1, 0), (150593572, 'w', 102, 1, 3), (150593573, 'w', 501, 1, 0), (150593574, 'w', 501, 1, 0), (150593575, 'w', 501, 1, 0), (150593578, 'w', 501, 1, 0), (150593579, 'w', 501, 1, 0), (266824805, 'w', 501, 1, 0), (267042056, 'w', 102, 1, 3), (267189919, 'w', 102, 1, 3), (267189927, 'w', 102, 1, 7), (267250300, 'w', 102, 1, 4), (267256494, 'w', 501, 1, 0), (267279270, 'w', 102, 1, 3), (267684255, 'w', 0, 1, 5), (304043753, 'w', 501, 1, 0), (309391191, 'w', 501, 1, 0), (309392035, 'w', 102, 1, 3), (309392214, 'w', 501, 1, 0), (309392471, 'w', 102, 1, 4), (351942438, 'w', 102, 1, 4), (407392931, 'w', 501, 1, 0), (409656672, 'w', 102, 1, 5), (420559879, 'w', 102, 1, 3), (420846304, 'w', 501, 1, 0), (420846333, 'w', 501, 1, 0), (420917619, 'w', 102, 1, 3), (420917621, 'w', 102, 1, 3), (421141159, 'w', 102, 1, 3), (421141175, 'w', 102, 1, 3), (423441353, 'w', 501, 1, 0), (423441354, 'w', 501, 1, 0), (423658290, 'w', 102, 1, 3), (423658293, 'w', 501, 1, 0), (426165511, 'w', 102, 1, 7), (428053218, 'w', 102, 1, 4), (428053219, 'w', 501, 1, 0), (431094506, 'w', 501, 1, 0), (431221783, 'w', 501, 1, 0), (431231623, 'w', 501, 1, 0), (431245500, 'w', 501, 1, 0), (431248274, 'w', 501, 1, 0), (431722531, 'w', 102, 1, 7), (431725914, 'w', 102, 1, 3), (431975596, 'w', 501, 1, 0), (432168057, 'w', 501, 1, 0), (485959900, 'w', 102, 1, 4), (534433680, 'w', 102, 1, 3), (534433684, 'w', 102, 1, 4), (534433687, 'w', 102, 1, 3), (534433690, 'w', 102, 1, 3), (534433692, 'w', 102, 1, 5), (534433698, 'w', 102, 1, 3), (534433702, 'w', 102, 1, 3), (548140464, 'w', 102, 1, 4), (683132070, 'w', 501, 1, 0), (683235610, 'w', 501, 1, 0)) AS t(id, id_type, status_code, n_rings, n_points)",
        # ENGINE-INDEPENDENT like areas_fixture: reproduced exactly by
        # tools/derive_goldens.py:derive_raster_vector_rows (transliterated
        # route flatten → per-edge bbox cover under an independently
        # implemented per-bit Morton cell id)
        "raster_vector": "SELECT cell_hex, CAST(route_id AS BIGINT) AS route_id FROM (VALUES ('000000001d5ad64d', 2030162), ('000000001d5ad66d', 2030162), ('000000001d5ad70d', 2030162)) AS t(cell_hex, route_id)",
        "minhash_near_dup": "SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b FROM (VALUES (8, 245), (26, 455), (31, 383), (44, 446), (45, 267), (45, 413), (58, 293), (61, 185), (70, 447), (72, 377), (87, 134), (92, 450), (98, 290), (107, 387), (120, 332), (152, 178), (166, 323), (267, 413), (285, 301), (295, 374), (310, 389), (326, 457), (393, 420), (435, 486), (458, 462)) AS t(doc_a, doc_b)",
        "simhash": "SELECT CAST(doc_id AS BIGINT) AS doc_id, simhash_hex FROM (VALUES (0, '4d58a9d01d8cd86e'), (1, '416bbdc0e7af187e'), (2, '4d1bef80718cc976'), (3, '4907ad99fd5fc876'), (4, '492fed80f70f085e'), (5, '600dede9e58f087e'), (6, 'd018ed02ea8880fe'), (7, 'e03abf00edcb0056'), (8, '453bad04c9cf9856'), (9, '714fad01e14f0876'), (10, '456dbd01e9cf48de'), (11, '617828c0b5cfc87e'), (12, '496aad2071df8874'), (13, '412fbf81f54f4a76'), (14, '4115ed81d50f0876'), (15, '414fa9c9e76e1d76'), (16, 'f00cecc0e499096e'), (17, '614ee9c1258e2976'), (18, '690fed40e9c50856'), (19, '651c6d8c688b0a66'), (20, '480bbd00ff8f0956'), (21, 'e82baf02bdcb0cd6'), (22, '414dadc964af097a'), (23, '603e6d806d8b085e'), (24, '614f2988bfcf097e'), (25, '491ead40658fca7e'), (26, '410ea049e5452c6a'), (27, '610fedc1e59dc856'), (28, '610eadc0658d087f'), (29, '610b2fc8219b004e'), (30, '4f0badc0756f587e'), (31, '600fed4ce18b2956'), (32, '691fed80efcb087e'), (33, '606a3ce8a59f0976'), (34, '491fbdc465ef0977'), (35, '494ba900bdce8956'), (36, '682f19c9a77f007e'), (37, '493fe904c5a79876'), (38, '480b9b01eccf0856'), (39, '431abd25754fe876'), (40, '412bb764e54b0856'), (41, '750dedc1cd8d5956'), (42, '490ffd02e78d085e'), (43, '410cad81678f087e'), (44, '686bf5e425216856'), (45, '411abd8475cfc977'), (46, '610bedc14ddfb376'), (47, '712ffde0e5c5687e'), (48, '69db9900a76e0977'), (49, '614cece055897976'), (50, '0939bdc4d58dcb57'), (51, '602a2740e9cb085e'), (52, '6d741d31d98fca74'), (53, '417aada07589017c'), (54, '601cbdc0e58f087f'), (55, '680b7f003f5e887e'), (56, '613dad40c58b087e'), (57, '491eadc0e58f085e'), (58, '455de501fdcd08c6'), (59, '40426d38b10f8816'), (60, '615dadc0e98f4856'), (61, '4971edc0d59d9946'), (62, '600ca9c0e58dc87e'), (63, '403abd806d8f085f'), (64, '4158e9406984104f'), (65, '6b78f5c16daa095f'), (66, '6019ad006d8b195e'), (67, '680feda3efcd487e'), (68, '706b9f00f9dab076'), (69, '496b2f18fdcf0876'), (70, '494bad40fddf9976'), (71, '455ded895d8d086e'), (72, '60782d10bdcd08fe'), (73, '507bfd40e51f987e'), (74, 'a04ea8a2b54d6c0e'), (75, '6906bd00adafd956'), (76, '6159edc4c5cf3856'), (77, '4479ad00dd8f187e'), (78, '610ded44c5cb2956'), (79, '4508a5c1648f4848'), (80, '615865105988807e'), (81, '4d0de984f7cf085e'), (82, '610fadc0e58f085e'), (83, '4069b94ce7bb1952'), (84, '690a2dc879c54878'), (85, '4b52e55079af995e'), (86, '492b9fa4555f4336'), (87, '5559ed44d58f1956'), (88, '690f6dc0c59dc87e'), (89, '41f965a9796d08f8'), (90, '095ead02b90e4846'), (91, '696fbd61e5af0977'), (92, '4b3aadd064ab927e'), (93, 'f10decc6a599f856'), (94, '400aaf0462971d53'), (95, '4d79adc4f5cb997e'), (96, '616dbde1e58f4876'), (97, '455dadc1ddcfce76'), (98, '4559e5c9dc8f08ee'), (99, '597bada0d14dc87e'), (100, '611abd006d938977'), (101, '49172910d18d8d7f'), (102, '6129ad44e9c938de'), (103, '4169bdc1c4df827f'), (104, '496fad80f54f486e'), (105, '690ded80ef89087e'), (106, '411aad34714faf34'), (107, '414e8d29e74e0d76'), (108, '4d4ee0c1510c296a'), (109, '416dadc1c58f4a74'), (110, 'e914b881edffc57f'), (111, '616dadc46c8f087e'), (112, '491bad8055ff9076'), (113, 'e01a3d00ed8b897e'), (114, '412aa5c8251b2146'), (115, 'f11dc88084cb1976'), (116, '4128bd44678b1f53'), (117, 'c06aaf40e98c087e'), (118, '692fadc0e5a7485e'), (119, '6031fd00c9831956'), (120, '610fe54c65d339f7'), (121, '493bbd24754f4b56'), (122, '693a3d90adaf487f'), (123, '292f6d80a7ab087e'), (124, '612ebdc1658f487f'), (125, '494ba98074ef887e'), (126, 'e17baf40ed4b0856'), (127, '615aad417dcc80ff'), (128, '6159a9c0edeb0946'), (129, '494fa9c1e5ef087e'), (130, '696afd817d8f5954'), (131, '69236d01657fa877'), (132, '615aad41ed8f8976'), (133, '640aedc06d8d187e'), (134, '5519ed04d4891956'), (135, '6b2ba5c86daf085e'), (136, '414cade9f5ff0976'), (137, '616bfd61659f9977'), (138, '694f6981adcd684e'), (139, '696b37e16dbf4870'), (140, '690f2981e9e70a7e'), (141, '416badc0e18d097e'), (142, '612aadc0e58f1856'), (143, '615ced044dcb2974'), (144, '7111fd80a5cb385e'), (145, '4139ad80d58f487e'), (146, 'e1251f8c4cfb4076'), (147, '4979ad60f94f0846'), (148, '493abdc0359fc055'), (149, '493bbdc4f72b1d56'), (150, '403aad98f58f1976'), (151, '616ffd81e56f087e'), (152, '691f6fc07997816e'), (153, '651dadc05d8f4976'), (154, '6978a580edaf485e'), (155, '692d3dc0ed8f585e'), (156, '490e2f02a945087e'), (157, '4006bf61e15fad76'), (158, '430da9cde09d01ea'), (159, '616da984e5cf0c7e'), (160, '69792d00ed8b0a4e'), (161, '413bbdc0e5af087e'), (162, '690bed406dc70976'), (163, '490ba9c4718d0976'), (164, '634c654baf8908db'), (165, '487a29b2b9cd887e'), (166, '4959edc1c88c886e'), (167, '653badc17d8f087e'), (168, '493b2d50518f1154'), (169, '697b9f80dddf1176'), (170, '041ead40d08d995e'), (171, '415abdb07dcf8976'), (172, '41526d187baf987b'), (173, '651ded80ddcf1846'), (174, '482ffda97fef4877'), (175, '088de986e7ed885e'), (176, '417bad60f96b0856'), (177, 'f17abd40ed8f885e'), (178, '69176dc06197806e'), (179, '4139ad40558b997e'), (180, '6519a9804cab017e'), (181, '6468a950cd8b195c'), (182, '490fad84f54f4876'), (183, 'c1461d01f15f8c76'), (184, '4569adc0c1cf1856'), (185, '4971edc0519d9946'), (186, '490bed0875ef1876'), (187, '494bad40e98e1856'), (188, '6d4dedc9fd8f486e'), (189, '417aad60759581ff'), (190, '4979ad80ddef9876'), (191, '503dbdc0c88d08de'), (192, '6c71e800c58b985e'), (193, '603f2dc0b58f1c7e'), (194, '612fbd21657fc876'), (195, '415ba980c1cd887e'), (196, '492bfd44d5dba076'), (197, '415aad4065af0976'), (198, '603c2c60d59fc874'), (199, '6838a580edad485e'), (200, '496bbd24f5cf1956'), (201, '4149e9c9e18d084e'), (202, '496cadc0fdcf485e'), (203, '405aace0378f117e'), (204, '4d0fad81d5cf4a36'), (205, '401eed80fd8d085e'), (206, '4b58a5407dec81df'), (207, 'e15fed41f14f0876'), (208, 'f06fa1e0a549084e'), (209, '49382dc0bdccc85f'), (210, '490fad00f5cfd956'), (211, '414bfd017f8e9977'), (212, '410f8f0461532d76'), (213, '491ead80e58fc87e'), (214, 'e2f81f00bf8b185e'), (215, '491eadc0758f595e'), (216, '402bfd08e19f1876'), (217, '6148ad40edcf487e'), (218, '4169bdc967af0972'), (219, '691b2900eff301ff'), (220, '6879ed80d58b1956'), (221, '681abd806d8f887e'), (222, '647aaf80f98f187e'), (223, '497dad80fdef087e'), (224, '692bbd00e3a319d7'), (225, '414bed44518db976'), (226, '4558a9454c8f9b70'), (227, '492bad04edcb1956'), (228, '612e2f40f5dfc876'), (229, '417b8d847dcf1876'), (230, '612bad446dcb1856'), (231, '4d19a844ddcf0946'), (232, 'c107ad40e94d0cde'), (233, '616f6de175df6974'), (234, '091eadc075afc87e'), (235, '616fad89ed6f48fe'), (236, '60cde0a9c68d083e'), (237, '487bbde0f53f9976'), (238, '455899c47dce4876'), (239, '401e8f00bf4a0856'), (240, '4d1ead8065cf4a76'), (241, '417bade0558f5976'), (242, '690fa980e5ef0d7e'), (243, '621a2d402b88087e'), (244, '706fbda4e5ef0876'), (245, '453bad04c9cf9856'), (246, '643aad90cd8bd85e'), (247, '497b6d806daf086c'), (248, '601bed806d8f087f'), (249, '6d5bed807d8f1846'), (250, '683bbf80e9030856'), (251, '491dbd80d48f0876'), (252, 'e86f3da1edef4876'), (253, '691b9d817defc876'), (254, 'e80d6caaafc9586e'), (255, '6b231580357f8177'), (256, '0368ad6c66890e7b'), (257, '683eaea0659f483e'), (258, '49672da1f94fc876'), (259, 'e13f4e88ff1b0076'), (260, 'c979a180ec6d086e'), (261, '496fad40f54f8876'), (262, '457aad407d8b997e'), (263, '414fa9c1f18f087e'), (264, '413bfd80f58f1876'), (265, 'e02d2840d5df9176'), (266, '680bbd80e1cf4876'), (267, '411abd80754fc976'), (268, '616f6dc8f50b386e'), (269, '493abf807d8f4856'), (270, '695f6d80ffaf087e'), (271, '410ffda9615f0874'), (272, '406abd20f5cfc876'), (273, 'e50dad816c8f187e'), (274, '692f6d81edef0876'), (275, '4d032d03f14e0856'), (276, '4159ad80fdcf0876'), (277, '1168bde5756ffc76'), (278, '5117ed40d5cd9977'), (279, '491abf007d9fc157'), (280, '696e2d80ed8fc87e'), (281, 'e94db945e56f4856'), (282, '602f6d89e185287c'), (283, '411aad00fdcf1956'), (284, '696feda97def4874'), (285, '490fadc0f5cf487e'), (286, '4148a9c0618f1152'), (287, '60a565996daf4855'), (288, '690aad11eb8f89d6'), (289, '4d0dad81fdcf08d6'), (290, '4559e5c9dc8d08ee'), (291, '610bed00e59b9876'), (292, 'e06b0d28f5cf0876'), (293, '455de581fdcd08c6'), (294, '692bb984e7ef187f'), (295, '4178ed0445831175'), (296, '61470d98fd4f0876'), (297, '791fed81a5af0876'), (298, 'e10dad40cdc5096e'), (299, '495bad80f5ef187e'), (300, '716d2dc8a56b1c46'), (301, '490fadc0f5cf487e'), (302, '6549e980c58d0876'), (303, '696ea941edcf487e'), (304, '250cadc0ed8d585e'), (305, '611fed4161132361'), (306, '416bad4061771972'), (307, '410b9d0067cf9976'), (308, 'c01bfd00fb0881d6'), (309, '490fbd40c14f8a56'), (310, '0960a955c7af997b'), (311, '4429ad81ec8f087e'), (312, 'e16dbd81edcf48fe'), (313, '2d4acdc0598cd874'), (314, '697bbd00edef5856'), (315, '610fadc1e76f087e'), (316, '412fade4f54f487e'), (317, 'e05a2d00efcb087e'), (318, 'c97aad40b5cb0976'), (319, '692fbdc5e5ff4877'), (320, '793bbdc0e58f1956'), (321, '692f29c4456f0875'), (322, 'c91fa942f9c488de'), (323, '4958edc1c88c086e'), (324, '591bbf80755ec876'), (325, '417badc07d8f9956'), (326, 'e10cabc0e4ef087e'), (327, '490de9c1e5cf0c6e'), (328, '490fed81e59f0876'), (329, '490aad0069cb085e'), (330, '686aad60f5c9887e'), (331, '610fa9c5e5df2b76'), (332, '6105e54c659339d7'), (333, '492fbd20f56dc876'), (334, '695aedc1d18fc854'), (335, '697f6f40f9cf6844'), (336, '6169f9a9e5ef0876'), (337, '610daccd65df6876'), (338, '4963dd0c716ab852'), (339, '4111ed003dd831d6'), (340, '4177a984f14f0c56'), (341, '491bed80f58f087e'), (342, 'e159ef8079dc30fe'), (343, 'e07aa948bd0b084e'), (344, '410cad00edcf187e'), (345, '692bbf00ff8b0876'), (346, '7579a9c0d5cd1c4e'), (347, '4178bde0748d197e'), (348, '017ba9c0d14d1d7e'), (349, '693ab5c064af487e'), (350, '491e2d98bfcf087e'), (351, '414bbdc067af0976'), (352, '611bed0065cb2976'), (353, '5953a540fd6f1856'), (354, '682aad00adcf0856'), (355, '414ab98d6bef08d2'), (356, '414ead81e9cd487e'), (357, '604c6dc1ddcfc87c'), (358, '54f19d91d44f8874'), (359, '60273ea1cd9fc176'), (360, '450fadc1f1cf087e'), (361, '711ffd805ddf8877'), (362, '082d6cbd66ef487f'), (363, '68332d90ddcf1156'), (364, '690facc8f59f5976'), (365, '60b42c909c8f0036'), (366, '415be9c1459f8976'), (367, '631bed406deb3c5e'), (368, '51fda5e95c2f48e9'), (369, '403a2d08798b087e'), (370, '6511e58c4ce118ff'), (371, '4953ed80dfef997e'), (372, '49077da0b54f4856'), (373, '41339dc0d48f9976'), (374, '4179ed4445831175'), (375, '4d19ed40458f997f'), (376, '515fed80f54d0856'), (377, '68782d10fdcd08ff'), (378, '495bed00756f1a76'), (379, '491abdc07d8e0977'), (380, '490ebf21e58f4956'), (381, '601de984e18d095e'), (382, '783bfd04e58bd857'), (383, '600fed4ce18b2956'), (384, '69ef2d21eb47487c'), (385, '6a2b3908ebaf095f'), (386, '693abd80fd8fc856'), (387, '414ead69e76e0d76'), (388, '683ffda0efa7487f'), (389, '0940a855c58f997b'), (390, '492abd0075cfc974'), (391, 'c96fed64e54b4856'), (392, 'cd4da94ce66f1dd6'), (393, '493f6d80d59f0876'), (394, 'c92f9f80f74f0876'), (395, '4129bdc565af4877'), (396, '416fed01f54f087e'), (397, 'e52da9c1cd8fc8de'), (398, '4b1ca560e58c89df'), (399, '6917ed80fdcf5956'), (400, '505ebde0e40f0816'), (401, '600eadc1ad8f0876'), (402, '689a9d90afaf897e'), (403, '493bad00f58f087e'), (404, 'e95aad40bdde887e'), (405, '4223ed40f5cbbd57'), (406, '493ba540c5e74854'), (407, '4975a5c1cca7086f'), (408, '0458ada8648f097e'), (409, '614bad41bd4e6874'), (410, '694ba940f7ef1976'), (411, '497bad807def187e'), (412, '683aad9035afd87e'), (413, '411abd8475cfc977'), (414, '6d5a2e907d8fc856'), (415, '697a8d107d8b997e'), (416, '692dbd81edaf485f'), (417, '696f2dc0b1cf187e'), (418, '710fedc1c51f0936'), (419, '406b9d20b74b0976'), (420, '493f6d80d59f0876'), (421, '610ffdc1e77f087e'), (422, '411fedc4f10d0856'), (423, '690fed85e1cf4876'), (424, '691f2d81fdcf085e'), (425, '400faea0715fe916'), (426, '650fadc1ed8f0856'), (427, '6069fd20fd8f9876'), (428, '4019e944e78909df'), (429, '616dbdc4e5af087f'), (430, '4931ed81dd8f0856'), (431, '4979ad00558b9974'), (432, '416dade0f56f0876'), (433, '493bbfb0d5bfc936'), (434, '495aad40fdcc887e'), (435, 'e0393d80d58b887e'), (436, '491fed00e7a78856'), (437, '5d59a9c0f5cd587e'), (438, 'e13d2dc0d5cb067e'), (439, '451bed49e80f08d6'), (440, '412fa9c5c1670856'), (441, '415dad80d48f0976'), (442, '656ba5c96caf087e'), (443, '6969e540e58b7856'), (444, '6d0f9d80e5cf5856'), (445, '4958a9407f88897f'), (446, '696ff5e425296877'), (447, '494badc0fddf9976'), (448, '606eeda8e789087e'), (449, '711bfd806dab0857'), (450, '4b3badd064bbda7e'), (451, '603a6d082d9b006e'), (452, '710ffdc1e5a70856'), (453, '695fad80fdef087e'), (454, '4507edc1618d884a'), (455, '434ea1ebe7452cea'), (456, '617c0db1fdcf4874'), (457, 'e10cafc1ecef087e'), (458, '495be900f98c09de'), (459, '4159ed88fdcf197e'), (460, '4910bd807dafc957'), (461, '495badccf52f0976'), (462, '495ae900f98c09de'), (463, 'e16cad40edcf887f'), (464, '6539a904efab115e'), (465, '690e2d81e9a7085e'), (466, '495aa9c0fd8f0976'), (467, '697bed60ed834844'), (468, '614ebd41ad9ff8d7'), (469, '432aad4026231d78'), (470, '6105a904edef1d7f'), (471, '69546c707d9fc976'), (472, '010ca9c0e68f087e'), (473, '414fad89e7ef187e'), (474, '597bb9c045efd876'), (475, '606ebda165af487e'), (476, '45782d48d9cb3044'), (477, 'e94f9bc1d59e4a36'), (478, '451ead8065cf0a76'), (479, '61717d88c5eb1d76'), (480, '692d2d44c5c35976'), (481, '094f9aa4e17e0936'), (482, '683bfd806583485f'), (483, '414ebda9f52f0876'), (484, '591feda0f54cc876'), (485, '494f9da4656f5976'), (486, '60393d00d58b807e'), (487, '612dadc1bdcf284e'), (488, '60215d98cd9f1976'), (489, '615a2910fbcb0977'), (490, '602dad02bdcb08de'), (491, '712bbdc0edeb1856'), (492, '8905b9c4d4fd9dff'), (493, '697bfd046dcba856'), (494, '4913ada475678977'), (495, '4115ed807d8d1956'), (496, '4d69ad84d5cd5876'), (497, '4823090c955b1476'), (498, '4969b985f5efc87f'), (499, '2d0e8f83fcce487e')) AS t(doc_id, simhash_hex)",
        # CLOSED-FORM planted-duplicate oracle (see _q_cosine_near_dup:
        # provable from the construction, not generated by the engine)
        "cosine_near_dup": "SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b FROM (VALUES (0, 1000), (2, 1002), (4, 1004), (6, 1006), (8, 1008), (10, 1010), (12, 1012), (14, 1014), (16, 1016), (18, 1018), (20, 1020), (22, 1022)) AS t(doc_a, doc_b)",
        # CLOSED-FORM oracle (constant-color images through the REAL PPM
        # decode: channel means == the colors, provable by construction)
        "multimodal_image": "SELECT CAST(media_id AS BIGINT) AS media_id, CAST(mean_r AS BIGINT) AS mean_r, CAST(mean_g AS BIGINT) AS mean_g, CAST(mean_b AS BIGINT) AS mean_b FROM (VALUES (0, 0, 0, 0), (1, 37, 59, 83), (2, 74, 118, 166), (3, 111, 177, 249), (4, 148, 236, 76), (5, 185, 39, 159), (6, 222, 98, 242), (7, 3, 157, 69), (8, 40, 216, 152), (9, 77, 19, 235), (10, 114, 78, 62), (11, 151, 137, 145), (12, 188, 196, 228), (13, 225, 255, 55), (14, 6, 58, 138), (15, 43, 117, 221), (16, 80, 176, 48), (17, 117, 235, 131), (18, 154, 38, 214), (19, 191, 97, 41), (20, 228, 156, 124), (21, 9, 215, 207), (22, 46, 18, 34), (23, 83, 77, 117), (24, 120, 136, 200), (25, 157, 195, 27), (26, 194, 254, 110), (27, 231, 57, 193), (28, 12, 116, 20), (29, 49, 175, 103), (30, 86, 234, 186), (31, 123, 37, 13)) AS t(media_id, mean_r, mean_g, mean_b)",
        # CLOSED-FORM: region is 5 rows at EVERY TPC-H scale factor (spec
        # fixed table); both partitions must be skipped on resume
        "checkpoint_resume": "SELECT partition, CAST(rows AS BIGINT) AS rows, CAST(resumed_count AS BIGINT) AS resumed_count FROM (VALUES ('p0', 5, 2), ('p1', 5, 2)) AS t(partition, rows, resumed_count)",
    }
