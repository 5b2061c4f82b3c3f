from .cell import (
    MAX_LEVEL,
    cell_bounds,
    cell_children,
    cell_level,
    cell_neighbors,
    cell_parent,
    cell_xy,
    choose_level_for_radius,
    cover_bbox,
    encode_cell,
)
from .pip import convex_hull, pack_ring, points_in_ring, ring_bbox, unpack_ring
from .join import assign_cells, knn_join, pip_join, raster_vector_join

__all__ = [
    "MAX_LEVEL",
    "assign_cells",
    "cell_bounds",
    "cell_children",
    "cell_level",
    "cell_neighbors",
    "cell_parent",
    "cell_xy",
    "choose_level_for_radius",
    "convex_hull",
    "cover_bbox",
    "encode_cell",
    "knn_join",
    "pack_ring",
    "pip_join",
    "points_in_ring",
    "raster_vector_join",
    "ring_bbox",
    "unpack_ring",
]
