"""The flagship end-to-end pipeline (the north-star composition).

pages -> geocode -> cellify -> PIP join (broadcast STRtree) -> per-tile
pixel partials -> hash-shuffle groupby(tile bucket) rasterize -> rio-color
stage.

One streaming Dataset: no stage materializes the corpus; the only
all-to-all exchange is the hash shuffle over pre-summed (tile_key, pix)
partials. Stateful stages run task-pool with per-process cached state by
default (fused with the map chain, warm workers) — pass
``use_actors=True`` for dedicated actor pools (see stages/statecache.py
for the measured trade-off). Used by ``__ray_entry__.entry()`` (sf0.001)
and ``bench.py`` (sf0.1 with replication).
"""

from ..sources.polygons import make_admin_polygons
from ..stages.pip_stage import PIPJoinStage
from ..stages.statecache import make_stage_fn
from .geo import cellified
from .tiles import DEFAULT_OPS, DEFAULT_ZOOM, color_stage, render_tiles_from


def flagship(
    sf_dir, replicate=1, ops=DEFAULT_OPS, z=DEFAULT_ZOOM, concurrency=4, use_actors=False
):
    """Corpus -> joined -> rasterized -> color-corrected tiles Dataset."""
    from ..color import parse_operations

    parse_operations(ops)  # validate the program before any work launches
    pts = cellified(sf_dir, keep_columns=["url", "lat", "lon"], replicate=replicate)
    if use_actors:
        joined = pts.map_batches(
            PIPJoinStage,
            fn_constructor_args=(make_admin_polygons(), "left"),
            batch_format="pyarrow",
            concurrency=(1, concurrency),
            max_restarts=0,  # ctor args live in the object store (ray#53727)
        )
    else:
        joined = pts.map_batches(
            make_stage_fn(PIPJoinStage, make_admin_polygons(), "left"),
            batch_format="pyarrow",
        )
    tiles = render_tiles_from(joined, z)
    return color_stage(tiles, ops, concurrency=concurrency, use_actors=use_actors)
