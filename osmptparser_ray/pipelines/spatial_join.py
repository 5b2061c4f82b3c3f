"""Flagship pipeline: pages → PT routes → stop/route spatial joins.

This is the north-star workload (BASELINE.json metric: "spatial-join output
rows/sec (stop→route PIP + kNN)"): parse OSM payloads out of CC-style
pages, flatten PTv2 routes, then

1. explode every route's stops into a stop-point table,
2. build convex route hulls from flattened geometries,
3. PIP-join stops into route hulls (cell cover + exact ray-cast refine),
4. kNN-join each stop to its k nearest stops within a radius,
5. assign stops to tiles (cell ids at a display level).

Output datasets stream to partitioned Parquet; the bench counts output
join rows per second.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..kernel.filters import PTV2
from ..spatial.cell import encode_cell
from ..spatial.join import knn_join, pip_join
from ..spatial.pip import convex_hull
from .ptv2 import public_transports_from_pages


def explode_stops(pt: rd.Dataset) -> rd.Dataset:
    """PT rows → one row per (stop_id, route_id, lat, lon).

    A stop node may serve several routes → duplicates by design; dedup by
    stop for point-tables via ``unique_stops``.
    """

    def explode(batch: pa.Table) -> pa.Table:
        # Arrow-offset flatten, zero per-stop Python (to_pylist of the
        # nested stops column was the dominant cost of this stage)
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        stops = batch["stops"].combine_chunks()
        counts = np.diff(np.asarray(stops.offsets))
        st = stops.flatten()
        return pa.table(
            {
                "stop_id": st.field("id"),
                "route_id": pa.array(np.repeat(ids, counts), pa.int64()),
                "lat": st.field("lat"),
                "lon": st.field("lon"),
            }
        )

    return pt.map_batches(explode, batch_format="pyarrow")


def unique_stops(stops: rd.Dataset, plan: str = "collect") -> rd.Dataset:
    """Distinct stop points. All duplicates of a stop id carry identical
    coords, so any-wins dedup is exact.

    ``plan="collect"`` (default): per-block dedup runs distributed (map
    tasks emit packed sorted-unique triples), the driver merges the
    already-small parts and re-distributes one Arrow table — no hash
    shuffle, so no aggregator-actor spin-up (~2 s fixed cost measured on
    this Ray version). Right whenever unique stops fit driver memory —
    the same contract the broadcast join plans already assume.
    ``plan="groupby"``: the shuffle realization for corpora whose stop
    table itself is huge (pairs with the shuffle join plans).
    """
    if plan == "groupby":
        from ray.data.aggregate import Min

        def local_dedup(batch: pa.Table) -> pa.Table:
            ids = batch["stop_id"].to_numpy(zero_copy_only=False)
            _, first_idx = np.unique(ids, return_index=True)
            take = pa.array(np.sort(first_idx), pa.int64())
            return pa.table(
                {
                    "stop_id": batch["stop_id"].take(take),
                    "lat": batch["lat"].take(take),
                    "lon": batch["lon"].take(take),
                }
            )

        return (
            stops.map_batches(local_dedup, batch_format="pyarrow")
            .groupby("stop_id")
            .aggregate(Min("lat", alias_name="lat"), Min("lon", alias_name="lon"))
        )

    def pack(batch: pa.Table) -> pa.Table:
        ids = batch["stop_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, first_idx = np.unique(ids, return_index=True)
        lats = batch["lat"].to_numpy(zero_copy_only=False)[first_idx]
        lons = batch["lon"].to_numpy(zero_copy_only=False)[first_idx]
        return pa.table(
            {
                "ids": pa.array([uniq.tobytes()], pa.binary()),
                "lats": pa.array([lats.tobytes()], pa.binary()),
                "lons": pa.array([lons.tobytes()], pa.binary()),
            }
        )

    id_parts, lat_parts, lon_parts = [], [], []
    packed = stops.map_batches(pack, batch_format="pyarrow", batch_size=1 << 17)
    for b in packed.iter_batches(batch_size=64, batch_format="pyarrow"):
        for i_, la_, lo_ in zip(
            b["ids"].to_pylist(), b["lats"].to_pylist(), b["lons"].to_pylist()
        ):
            id_parts.append(np.frombuffer(i_, np.int64))
            lat_parts.append(np.frombuffer(la_, np.float64))
            lon_parts.append(np.frombuffer(lo_, np.float64))
    if not id_parts:
        return rd.from_arrow(
            pa.table(
                {
                    "stop_id": pa.array([], pa.int64()),
                    "lat": pa.array([], pa.float64()),
                    "lon": pa.array([], pa.float64()),
                }
            )
        )
    ids = np.concatenate(id_parts)
    lats = np.concatenate(lat_parts)
    lons = np.concatenate(lon_parts)
    uniq, first_idx = np.unique(ids, return_index=True)
    merged = pa.table(
        {
            "stop_id": pa.array(uniq, pa.int64()),
            "lat": pa.array(lats[first_idx], pa.float64()),
            "lon": pa.array(lons[first_idx], pa.float64()),
        }
    )
    # re-distribute as MANY blocks — a single from_arrow block would
    # serialize every downstream map stage onto one worker
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 4))
    n_blocks = max(1, min(2 * cpus, merged.num_rows))
    step = -(-merged.num_rows // n_blocks)
    slices = [merged.slice(i, step) for i in range(0, merged.num_rows, step)]
    return rd.from_arrow(slices)


def route_hulls(pt: rd.Dataset) -> rd.Dataset:
    """PT rows → route service-area hulls (poly_id, ring_lats, ring_lons).

    The hull is the convex hull of the route's flattened geometry points
    UNION its stop points — so Broken routes (empty geometry, reference
    status 501) still get a hull from their stops, and every route with ≥3
    distinct points participates in the PIP join.
    """

    def hulls(batch: pa.Table) -> pa.Table:
        # Arrow-offset flattening instead of to_pylist: nested
        # list<list<struct>> → flat lat/lon numpy + per-route boundaries
        # (converting every geometry point to a python dict was the
        # dominant cost of this stage). The per-route convex_hull call
        # stays a loop, but over numpy slices only.
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        geom = batch["geometry"].combine_chunks()
        # offsets are normalized to zero-base so they index the FLATTENED
        # child arrays even when the parent is a sliced view
        outer_off = np.asarray(geom.offsets)  # route → segment range
        outer_off = outer_off - outer_off[0]
        segs = geom.flatten()
        inner_off = np.asarray(segs.offsets)  # segment → point range
        inner_off = inner_off - inner_off[0]
        pts = segs.flatten()
        g_lats = pts.field("lat").to_numpy(zero_copy_only=False)
        g_lons = pts.field("lon").to_numpy(zero_copy_only=False)
        route_pt_bounds = inner_off[outer_off]  # flat point idx at route starts

        stops_arr = batch["stops"].combine_chunks()
        stop_off = np.asarray(stops_arr.offsets)
        stop_off = stop_off - stop_off[0]
        stop_struct = stops_arr.flatten()
        s_lats = stop_struct.field("lat").to_numpy(zero_copy_only=False)
        s_lons = stop_struct.field("lon").to_numpy(zero_copy_only=False)

        out_ids, out_la, out_lo = [], [], []
        for i in range(len(ids)):
            ga, gb = route_pt_bounds[i], route_pt_bounds[i + 1]
            sa, sb = stop_off[i], stop_off[i + 1]
            lats = np.concatenate([g_lats[ga:gb], s_lats[sa:sb]])
            if len(lats) < 3:
                continue
            lons = np.concatenate([g_lons[ga:gb], s_lons[sa:sb]])
            hy, hx = convex_hull(lats, lons)
            if len(hy) < 3:
                continue
            out_ids.append(int(ids[i]))
            out_la.append(hy)
            out_lo.append(hx)
        return pa.table(
            {
                "poly_id": pa.array(out_ids, pa.int64()),
                "ring_lats": pa.array([a.tolist() for a in out_la], pa.list_(pa.float64())),
                "ring_lons": pa.array([a.tolist() for a in out_lo], pa.list_(pa.float64())),
            }
        )

    return pt.map_batches(hulls, batch_format="pyarrow")


def assign_tiles(stops: rd.Dataset, level: int) -> rd.Dataset:
    def add(batch: pa.Table) -> pa.Table:
        cells = encode_cell(
            batch["lat"].to_numpy(zero_copy_only=False),
            batch["lon"].to_numpy(zero_copy_only=False),
            level,
        )
        return batch.append_column("cell", pa.array(cells, pa.uint64()))

    return stops.map_batches(add, batch_format="pyarrow")


def stop_route_spatial_join(
    pages_path: str,
    *,
    gap: float = 1500.0,
    filters: str = PTV2,
    pip_level: int = 12,
    pip_salt: int = 1,
    knn_k: int = 5,
    knn_radius_m: float = 2000.0,
    tile_level: int = 14,
    small_side: str = "broadcast",
    validate: bool = True,
    concurrency: Optional[int | tuple[int, int]] = None,
) -> dict[str, rd.Dataset]:
    """The flagship: returns the component datasets (all lazy).

    Keys: public_transports, stops (unique), pip (stop×route-hull pairs),
    knn (stop k-nearest-stop rows), tiles (stop→cell assignment).

    ``small_side="broadcast"`` (default): hulls / target stops are the
    small sides of both spatial joins — broadcast plans (zero shuffle).
    ``small_side="shuffle"``: the groupby-on-cell / hash-join plans that
    scale to big-big joins; results identical (tested).
    """
    from ..spatial.join import knn_join_broadcast, pip_join_broadcast

    pt = public_transports_from_pages(
        pages_path, gap=gap, filters=filters, validate=validate, concurrency=concurrency
    ).materialize()  # consumed by 3 downstream branches; small (one row per route)
    stops_all = explode_stops(pt)
    stops = unique_stops(stops_all).materialize()  # reused by pip + knn + tiles
    hulls = route_hulls(pt)
    stops_as_targets = stops.map_batches(
        lambda t: t.rename_columns(["target_id", "lat", "lon"]), batch_format="pyarrow"
    )
    if small_side == "broadcast":
        # both builds block on driver-side collects fed by cluster
        # streams — run them concurrently so neither idles the cluster
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as ex:
            f_pip = ex.submit(pip_join_broadcast, stops, hulls, point_id="stop_id")
            f_knn = ex.submit(
                knn_join_broadcast,
                stops,
                stops_as_targets,
                k=knn_k,
                radius_m=knn_radius_m,
                query_id="stop_id",
            )
            pip_pairs = f_pip.result()
            knn_pairs = f_knn.result()
    else:
        pip_pairs = pip_join(
            stops, hulls, level=pip_level, salt=pip_salt, point_id="stop_id"
        )
        knn_pairs = knn_join(
            stops, stops_as_targets, k=knn_k, radius_m=knn_radius_m, query_id="stop_id"
        )
    tiles = assign_tiles(stops, tile_level)
    return {
        "public_transports": pt,
        "stops": stops,
        "pip": pip_pairs,
        "knn": knn_pairs,
        "tiles": tiles,
    }

