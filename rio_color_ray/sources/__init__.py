"""Deterministic synthetic sources (pages corpus, admin polygons, tiles)."""

from .pages import (
    HOTSPOTS,
    page_coords_microdeg,
    pages_sql_cte,
    synth_pages_batch,
)
from .polygons import make_admin_polygons, make_admin_rects
from .tiles import make_tiles_table

__all__ = [
    "HOTSPOTS",
    "page_coords_microdeg",
    "pages_sql_cte",
    "synth_pages_batch",
    "make_admin_polygons",
    "make_admin_rects",
    "make_tiles_table",
]
