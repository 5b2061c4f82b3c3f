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
        rids = batch["id"].to_pylist()
        stops_col = batch["stops"].to_pylist()
        out = {"stop_id": [], "route_id": [], "lat": [], "lon": []}
        for rid, stops in zip(rids, stops_col):
            for s in stops:
                out["stop_id"].append(s["id"])
                out["route_id"].append(rid)
                out["lat"].append(s["lat"])
                out["lon"].append(s["lon"])
        return pa.table(
            {
                "stop_id": pa.array(out["stop_id"], pa.int64()),
                "route_id": pa.array(out["route_id"], pa.int64()),
                "lat": pa.array(out["lat"], pa.float64()),
                "lon": pa.array(out["lon"], pa.float64()),
            }
        )

    return pt.map_batches(explode, batch_format="pyarrow")


def unique_stops(stops: rd.Dataset) -> rd.Dataset:
    """Distinct stop points — local per-batch dedup (combiner) then a
    groupby-aggregate over the much smaller residue. All duplicates of a
    stop id carry identical coords, so Min(lat)/Min(lon) is exact."""
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


def route_hulls(pt: rd.Dataset) -> rd.Dataset:
    """PT rows → route service-area hulls (poly_id, ring_lats, ring_lons).

    The hull is the convex hull of the route's flattened geometry points
    UNION its stop points — so Broken routes (empty geometry, reference
    status 501) still get a hull from their stops, and every route with ≥3
    distinct points participates in the PIP join.
    """

    def hulls(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        geoms = batch["geometry"].to_pylist()
        stops_col = batch["stops"].to_pylist()
        out_ids, out_la, out_lo = [], [], []
        for rid, geom, stops in zip(ids, geoms, stops_col):
            lats = [p["lat"] for seg in geom for p in seg] + [s["lat"] for s in stops]
            lons = [p["lon"] for seg in geom for p in seg] + [s["lon"] for s in stops]
            if len(lats) < 3:
                continue
            hy, hx = convex_hull(np.array(lats), np.array(lons))
            if len(hy) < 3:
                continue
            out_ids.append(rid)
            out_la.append(hy.tolist())
            out_lo.append(hx.tolist())
        return pa.table(
            {
                "poly_id": pa.array(out_ids, pa.int64()),
                "ring_lats": pa.array(out_la, pa.list_(pa.float64())),
                "ring_lons": pa.array(out_lo, pa.list_(pa.float64())),
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
        pip_pairs = pip_join_broadcast(stops, hulls, point_id="stop_id")
        knn_pairs = knn_join_broadcast(
            stops, stops_as_targets, k=knn_k, radius_m=knn_radius_m, query_id="stop_id"
        )
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

