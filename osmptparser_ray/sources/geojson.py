"""GeoJSON encoders — structural parity with the reference's serializers.

Reference: PublicTransport::to_geojson (relation.rs:363-400) and
Area::to_geojson (relation.rs:340-360).

Bug-compatible quirks preserved:
* a PT's geometry is emitted as ONE Feature typed "LineString" whose
  coordinates are the full Vec<Vec<(lon,lat)>> (i.e. multilinestring
  nesting under a LineString label) — exactly as the reference writes it;
* an Area is a single "Polygon" Feature with the ring list;
* key order inside tags/info is map-iteration order (the reference's
  HashMap order is nondeterministic; consumers must treat objects as
  unordered — our tests compare parsed JSON, not bytes).

``to_geojson_*`` take plain row dicts (as produced by Dataset.take /
iter_rows over PT_SCHEMA / AREA_SCHEMA rows). ``encode_*`` are vectorized
map_batches stages emitting a ``geojson:string`` column.
"""

from __future__ import annotations

import json

import pyarrow as pa


def _tags_obj(items) -> dict:
    return dict(items) if items is not None else {}


def _geom_coords(geometry) -> list:
    return [[[p["lon"], p["lat"]] for p in seg] for seg in geometry]


def to_geojson_pt(row: dict) -> str:
    """One PublicTransport row → GeoJSON string (reference relation.rs:363-400)."""
    return json.dumps(
        {
            "type": "FeatureCollection",
            "properties": {
                "id": row["id"],
                "tags": _tags_obj(row["tags"]),
                "info": _tags_obj(row["info"]),
                "parse_status": {
                    "code": row["status_code"],
                    "detail": row["status_detail"],
                },
            },
            "features": [
                {
                    "type": "Feature",
                    "geometry": {
                        "type": "LineString",
                        "coordinates": _geom_coords(row["geometry"]),
                    },
                },
                {
                    "type": "FeatureCollection",
                    "features": [
                        {
                            "type": "Feature",
                            "properties": {"id": s["id"], "tags": _tags_obj(s["tags"])},
                            "geometry": {
                                "type": "Point",
                                "coordinates": [s["lon"], s["lat"]],
                            },
                        }
                        for s in row["stops"]
                    ],
                },
            ],
        },
        ensure_ascii=False,
    )


def to_geojson_area(row: dict) -> str:
    """One Area row → GeoJSON string (reference relation.rs:340-360)."""
    return json.dumps(
        {
            "type": "Feature",
            "properties": {
                "id": row["id"],
                "id_type": row["id_type"],
                "tags": _tags_obj(row["tags"]),
                "info": _tags_obj(row["info"]),
                "parse_status": {
                    "code": row["status_code"],
                    "detail": row["status_detail"],
                },
            },
            "geometry": {"type": "Polygon", "coordinates": _geom_coords(row["geometry"])},
        },
        ensure_ascii=False,
    )


def encode_pt_geojson(batch: pa.Table) -> pa.Table:
    rows = batch.to_pylist()
    return pa.table(
        {
            "id": batch["id"],
            "geojson": pa.array([to_geojson_pt(r) for r in rows], pa.string()),
        }
    )


def encode_area_geojson(batch: pa.Table) -> pa.Table:
    rows = batch.to_pylist()
    return pa.table(
        {
            "id": batch["id"],
            "geojson": pa.array([to_geojson_area(r) for r in rows], pa.string()),
        }
    )
